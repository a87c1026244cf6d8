"""Probe: why does the persistent XLA cache miss across processes for the
fused train step? (CLAUDE.md gotcha 12.)

Computes the cache fingerprint WITHOUT compiling: traces + lowers the fused
step, then (a) hashes the canonicalized StableHLO module, (b) computes
jax's full persistent-cache key component by component.  Run this twice in
fresh processes and diff the output; any component that differs is the
cache-buster.

    python scripts/probe_cache_fingerprint.py --platform cpu --dump /tmp/a
    python scripts/probe_cache_fingerprint.py --platform cpu --dump /tmp/b
    diff /tmp/a.stablehlo /tmp/b.stablehlo
"""

from __future__ import annotations

import argparse
import hashlib
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--dump", default=None,
                    help="prefix to dump .stablehlo text to")
    ap.add_argument("--full", action="store_true",
                    help="bench.py flagship config (full SD 2.1, bf16 "
                         "guidance, triplane 64²) instead of tiny")
    args = ap.parse_args()

    if args.platform == "cpu":
        from dreamfusion_tpu.utils.platform import force_cpu
        force_cpu(1)

    import jax

    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
    from dreamfusion_tpu.training.trainer import Trainer

    if args.full:
        import jax.numpy as jnp
        cfg = finalize(Config(
            text="a highly detailed hamburger", workspace="/tmp/dftpu_probe",
            backbone="triplane", w=64, h=64,
            latent_iter_ratio=0.0, fp16=True, seed=0,
            lambda_3d_normal_smooth=0.0,
        ))
        key = jax.random.PRNGKey(0)
        g = StableDiffusionGuidance(SDConfig(sd_version="2.1"))
        gp = g.init_params(key)
        gp = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, gp)
    else:
        cfg = finalize(Config(
            text="a hamburger", workspace="/tmp/dftpu_probe",
            backbone="triplane", w=16, h=16, iters=4, batch_size=1,
            triplane_resolution=32, triplane_channels=4,
            latent_iter_ratio=0.0, grid_size=32, grid_coarse_steps=16,
            grid_fine_steps=16, hidden_dim=16, num_layers=2, hidden_dim_bg=8,
            num_layers_bg=2, seed=0, eval_interval=-1,
            lambda_3d_normal_smooth=0.0,
        ))
        key = jax.random.PRNGKey(0)
        g = StableDiffusionGuidance(SDConfig(tiny=True, image_size=16,
                                             latent_size=8))
        gp = g.init_params(key)
    emb = prepare_text_embeddings(g, gp, cfg.text)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gp},
                 embeddings={"SD": emb})
    state = tr.init_state(key)
    step = tr._make_train_step("main")

    lowered = step.jitted.lower(state, jax.random.PRNGKey(1), step.gp_dev,
                                step.emb_dev)
    text = lowered.as_text()
    print(f"module text: {len(text)} chars, "
          f"sha256={hashlib.sha256(text.encode()).hexdigest()}")
    if args.dump:
        with open(args.dump + ".stablehlo", "w") as f:
            f.write(text)
        print(f"dumped to {args.dump}.stablehlo")

    # per-component persistent-cache key (what jax actually uses)
    from jax._src import cache_key

    logging.basicConfig(stream=sys.stderr, level=logging.DEBUG)
    cache_key.logger.setLevel(logging.DEBUG)

    import numpy as np
    backend = jax.devices()[0].client
    module = lowered.compiler_ir(dialect="stablehlo")
    from jax._src import compiler
    compile_options = compiler.get_compile_options(
        num_replicas=1, num_partitions=1)
    devices = np.array([[jax.devices()[0]]])
    k = cache_key.get(module, devices, compile_options, backend)
    print(f"full persistent cache key: {k}")


if __name__ == "__main__":
    main()
