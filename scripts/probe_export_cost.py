"""Per-phase wall-clock of the textured mesh export on the real TPU.

RUN_r03's post-train phase was killed >700 s into `export_mesh` (root
cause: the UV raster sweep ran EAGERLY and materialized a 12 GB
[tiles, px, cap, 3] tensor — see ops/raster.py tile_batch).  export_mesh
now logs its own phase breakdown; this probe drives it on an untrained
flagship state (the density blob provides a real surface) and prints the
total.

Run on the TPU: python scripts/probe_export_cost.py [--resolution 256]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--tex_res", type=int, default=1024)
    ap.add_argument("--workspace", default="/tmp/probe_export")
    ap.add_argument("--ckpt", default=None,
                    help="load a trained checkpoint from this workspace "
                         "(e.g. /root/runs/r4_flagship) instead of the "
                         "untrained blob — the degenerate saturated-field "
                         "case costs very differently")
    args = ap.parse_args()

    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.mesh.export import export_mesh
    from dreamfusion_tpu.training.trainer import Trainer

    t0 = time.time()
    from dataclasses import replace

    from dreamfusion_tpu.config import load_config_json

    ws = args.ckpt if args.ckpt else args.workspace
    # NEVER hand the run's workspace to the probe Trainer — its ctor
    # persists ITS config.json and would clobber the run's record
    # (happened once to r5_image_oracle); a temp workspace with a
    # symlinked (absolute-target) checkpoints dir gives load_checkpoint
    # the real ckpts
    import tempfile
    ws_probe = tempfile.mkdtemp(prefix="dftpu_export_probe_")
    ckpt_dir = os.path.abspath(os.path.join(ws, "checkpoints"))
    if args.ckpt:
        assert os.path.isdir(ckpt_dir), f"no checkpoints under {ws}"
        os.symlink(ckpt_dir, os.path.join(ws_probe, "checkpoints"))
    saved_cfg = os.path.join(ws, "config.json")
    if args.ckpt and os.path.exists(saved_cfg):
        # the run's own (finalized) config: EVERY param-tree-shaping
        # field matches the checkpoint by construction (a hand-picked
        # field subset went stale immediately — ADVICE r5)
        cfg = replace(load_config_json(saved_cfg), workspace=ws_probe,
                      eval_interval=-1, use_tensorboard=False)
    else:
        cfg = finalize(Config(text="x", workspace=ws_probe,
                              backbone="triplane", seed=0,
                              eval_interval=-1, use_tensorboard=False))
    tr = Trainer(cfg, guidances={}, guidance_params={}, embeddings={})
    state = tr.init_state(jax.random.PRNGKey(0))
    if args.ckpt:
        state, ok = tr.load_checkpoint(state, "latest")
        print(f"[probe] checkpoint restore from {ws}: ok={ok}", flush=True)
        assert ok
    # sacrificial tiny program (gotcha 9: first executable can hit ~100s)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    print(f"[probe] init {time.time() - t0:.1f}s", flush=True)

    t = time.time()
    path = export_mesh(tr, state, os.path.join("/tmp/probe_export", "mesh"),
                       resolution=args.resolution, tex_res=args.tex_res)
    print(f"[probe] export_mesh total {time.time() - t:.1f}s -> {path}",
          flush=True)
    # warm second run (persistent compile cache + jit cache)
    t = time.time()
    export_mesh(tr, state, os.path.join("/tmp/probe_export", "mesh2"),
                resolution=args.resolution, tex_res=args.tex_res)
    print(f"[probe] export_mesh warm {time.time() - t:.1f}s", flush=True)


if __name__ == "__main__":
    main()
