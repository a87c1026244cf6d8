"""Split-step vs fused: cold-compile cost per program + the render-knob
recompile story (VERDICT r1 item 8).

Uses a FRESH persistent cache dir so "cold" is honest, then re-times after
a render-knob change (grid_fine_steps 32 -> 24): in split mode the guidance
program's HLO is untouched by render knobs (it only sees the image), so
only the two small render programs re-pay compilation; the fused step
re-pays everything.

    python scripts/profile_split_compile.py [--skip_fused]

Writes nothing; prints a table.  Steady-state it/s comparison comes from
`python bench.py [--split]` (warm cache, best-of-3).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fresh cache BEFORE the package import wires jax_compilation_cache_dir
_CACHE = tempfile.mkdtemp(prefix="dftpu_splitcache_")
os.environ["DFTPU_COMPILE_CACHE"] = _CACHE

import jax
import jax.numpy as jnp


def build(split: bool, fine: int):
    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
    from dreamfusion_tpu.training.trainer import Trainer

    cfg = finalize(Config(
        text="a highly detailed hamburger", workspace="/tmp/dftpu_split",
        backbone="triplane", w=64, h=64, latent_iter_ratio=0.0, fp16=True,
        seed=0, lambda_3d_normal_smooth=0.0, split_step=split,
        grid_fine_steps=fine))
    g = StableDiffusionGuidance(SDConfig(sd_version="2.1"))
    key = jax.random.PRNGKey(0)
    gp = g.init_params(key)
    gp = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x, gp)
    emb = prepare_text_embeddings(g, gp, cfg.text)
    emb = {k: v.astype(jnp.float32) for k, v in emb.items()}
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gp},
                 embeddings={"SD": emb})
    state = tr.init_state(key)
    return tr, state


def time_split_compiles(tr, state, tag):
    step = tr._make_train_step("main")
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    pred_rgb = step.render_fwd(state, key)
    jax.block_until_ready(pred_rgb)
    t_fwd = time.time() - t0
    t0 = time.time()
    sds, cot = step.guidance_grad(step.gp_dev, step.emb_dev, state.step,
                                  key, pred_rgb)
    jax.block_until_ready(cot)
    t_gg = time.time() - t0
    t0 = time.time()
    new_state, metrics = step.render_bwd_update(state, key, sds, cot)
    jax.block_until_ready(metrics["loss"])
    t_bwd = time.time() - t0
    print(f"[{tag}] split compile+first-run: render_fwd {t_fwd:.1f}s, "
          f"guidance_grad {t_gg:.1f}s, render_bwd_update {t_bwd:.1f}s "
          f"(total {t_fwd + t_gg + t_bwd:.1f}s)", flush=True)
    return t_fwd + t_gg + t_bwd


def time_fused_compile(tr, state, tag):
    step = tr._make_train_step("main")
    t0 = time.time()
    new_state, metrics = step(state, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics["loss"])
    t = time.time() - t0
    print(f"[{tag}] fused compile+first-run: {t:.1f}s", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_fused", action="store_true",
                    help="only measure the split programs")
    args = ap.parse_args()
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    # sacrificial program (CLAUDE.md gotcha 9)
    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    print(f"cache dir: {_CACHE}")
    tr, state = build(split=True, fine=32)
    t_split_cold = time_split_compiles(tr, state, "cold fine=32")

    # render-knob change: guidance program should be a cache hit
    tr2, state2 = build(split=True, fine=24)
    t_split_knob = time_split_compiles(tr2, state2, "knob fine=24")

    if not args.skip_fused:
        tr3, state3 = build(split=False, fine=32)
        t_fused_cold = time_fused_compile(tr3, state3, "cold fine=32")
        tr4, state4 = build(split=False, fine=24)
        t_fused_knob = time_fused_compile(tr4, state4, "knob fine=24")
        print("\n==== summary (s) ====")
        print(f"cold:        split {t_split_cold:8.1f}   fused {t_fused_cold:8.1f}")
        print(f"knob change: split {t_split_knob:8.1f}   fused {t_fused_knob:8.1f}")


if __name__ == "__main__":
    main()
