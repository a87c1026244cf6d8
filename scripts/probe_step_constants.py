"""Find large compile-time constants baked into the fused-step HLO.

The persistent-cache entries for jit_train_step are 74-102 MB, and the
per-program first-execution tax through the tunnel scales with serialized
executable size (~0.4-0.8 s/MB measured, scripts/probe_fence_tax.py +
probe_buffer_tax.py).  100 MB of executable for a step whose code is a
few thousand HLO ops means megabytes of CONSTANTS are being baked in —
this script traces the exact flagship step on CPU and lists every closed
jaxpr constant above a size threshold, with dtype/shape, so they can be
turned into computed values or arguments.

    JAX_PLATFORMS=cpu python scripts/probe_step_constants.py [--min_mb 0.5]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dreamfusion_tpu.utils.platform import force_cpu  # noqa: E402

force_cpu()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dreamfusion_tpu.config import Config, finalize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min_mb", type=float, default=0.25)
    ap.add_argument("--phase", default="main")
    args = ap.parse_args()

    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
    from dreamfusion_tpu.training.trainer import Trainer

    cfg = finalize(Config(
        text="a DSLR photo of a delicious hamburger",
        workspace="/tmp/dftpu_constprobe", backbone="triplane", seed=0,
        lambda_3d_normal_smooth=0.0, eval_interval=10, ckpt="scratch",
        iters=10000,
    ))
    key = jax.random.PRNGKey(0)
    g = StableDiffusionGuidance(SDConfig(sd_version=cfg.sd_version,
                                         t_range=cfg.t_range))
    gp = g.init_params(key)
    gp = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x, gp)
    emb = prepare_text_embeddings(g, gp, cfg.text, cfg.negative)
    emb = {k: np.asarray(v, np.float32) for k, v in emb.items()}
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gp},
                 embeddings={"SD": emb})
    state = tr.init_state(key)
    fn = tr._make_train_step(args.phase)

    print("[consts] tracing train_step jaxpr...", flush=True)
    closed = jax.make_jaxpr(fn.jitted)(state, key, fn.gp_dev, fn.emb_dev)
    consts = closed.consts
    total = 0
    rows = []
    for c in consts:
        if not hasattr(c, "nbytes"):
            continue
        total += c.nbytes
        if c.nbytes >= args.min_mb * 1e6:
            rows.append((c.nbytes, str(c.dtype), tuple(c.shape)))
    rows.sort(reverse=True)
    print(f"[consts] top-level consts: {len(consts)}, "
          f"total {total / 1e6:.1f} MB")
    for nbytes, dt, shape in rows[:40]:
        print(f"  {nbytes / 1e6:8.2f} MB  {dt:10s} {shape}")

    # scan-block variant (what the flagship actually dispatches)
    if hasattr(fn, "block"):
        print("[consts] tracing train_block jaxpr...", flush=True)
        import inspect
        blk = fn.block
        closed = jax.make_jaxpr(lambda s, k: blk(s, k))(state, key)
        consts = closed.consts
        total = sum(getattr(c, "nbytes", 0) for c in consts)
        print(f"[consts] block consts total {total / 1e6:.1f} MB "
              f"({len(consts)} consts)")


if __name__ == "__main__":
    main()
