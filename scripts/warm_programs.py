"""Pre-compile every program the flagship 10k run dispatches.

Populates the persistent XLA cache (package __init__) with the latent
step, main step, density-grid update, and the fused 800² eval/test view
program, using the EXACT config scripts/run_flagship.py drives — so the
timed run is measured in the warm-cache operating mode (the reference
pays no compile; this framework pays each program once per config, then
never again).

Run: python scripts/warm_programs.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dreamfusion_tpu.config import Config, finalize

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
from dreamfusion_tpu.training.trainer import Trainer

# mirror run_flagship.py's CLI overrides exactly
cfg = finalize(Config(
    text="a DSLR photo of a delicious hamburger",
    workspace="/tmp/dftpu_warm", backbone="triplane", seed=0,
    lambda_3d_normal_smooth=0.0, eval_interval=10, ckpt="scratch",
    save_mesh=True, iters=10000,
))

t0 = time.time()
key = jax.random.PRNGKey(0)
g = StableDiffusionGuidance(SDConfig(sd_version=cfg.sd_version,
                                     t_range=cfg.t_range))
# bf16 slab init, exactly as main.build_guidance does under fp16
gp = g.init_params(key, dtype=jnp.bfloat16)
emb = prepare_text_embeddings(g, gp, cfg.text, cfg.negative)
emb = {k: v.astype(jnp.float32) for k, v in emb.items()}
print(f"[warm] guidance ready {time.time()-t0:.0f}s", flush=True)

tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gp},
             embeddings={"SD": emb})
state = tr.init_state(key)

# the CLI builds ONE fused warmup+main program when _fused_phase_ok
# (trainer.train); mirror that exact program set
programs = [("update_grid", tr._make_update_grid())]
if tr._fused_phase_ok():
    programs.append(("fused_step", tr._make_train_step("fused")))
else:
    programs.append(("latent_step", tr._make_train_step("latent")))
    programs.append(("main_step", tr._make_train_step("main")))
for name, fn in programs:
    t = time.time()
    out = fn(state, key)
    state = out[0] if isinstance(out, tuple) else out
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    print(f"[warm] {name} compiled+ran in {time.time()-t:.1f}s", flush=True)

t = time.time()
view_fn = tr._get_view_fn(cfg.H, cfg.W, quantized=True)
img, _, _ = view_fn(state.ema_params, state.occ_grid, cfg.default_radius,
                    cfg.default_polar, 0.0, key)
float(jnp.sum(img.astype(jnp.float32)))
print(f"[warm] 800² view program compiled+ran in {time.time()-t:.1f}s",
      flush=True)
print(f"[warm] total {time.time()-t0:.0f}s")
