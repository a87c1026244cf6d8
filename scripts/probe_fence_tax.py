"""Decompose the per-process first-execution tax (VERDICT r4 item 2).

RUN_r04 measured a 744.6 s first-iteration fence (dispatch 25.9 s) on a
fully WARM persistent cache, for a step that executes at 75 ms steady —
a per-process device/tunnel first-EXECUTION tax.  This probe runs the
EXACT flagship program set (mirrors scripts/run_flagship.py's config like
scripts/warm_programs.py) but fences after every phase, so the 700+ s
decomposes into per-program components:

  tiny jit | guidance init gen ×3 + cast | CLIP text embed | state init |
  grid update | latent step (1st + 2nd) | main step (1st + 2nd) |
  800² eval view (1st + 2nd)

Modes (--mode):
  seq       one fence per phase (the decomposition)
  overlap   dispatch EVERYTHING first, fence once at the end — tests
            whether per-program load/setup can proceed concurrently in
            background threads while earlier programs execute
  nolatent  seq, but skip the latent program (is the tax per-program?)

Run on the real TPU:  python scripts/probe_fence_tax.py --mode seq
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dreamfusion_tpu.config import Config, finalize

jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

T = {}
_t0 = time.time()


def mark(name, t_start):
    T[name] = round(time.time() - t_start, 2)
    print(f"[tax] {name}: {T[name]:.1f}s  (wall {time.time() - _t0:.0f}s)",
          flush=True)


def fence(tree):
    """float() one leaf — the only trustworthy fence through the tunnel
    (CLAUDE.md gotcha 7: block_until_ready can return early)."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    x = leaves[0]
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="seq",
                    choices=["seq", "overlap", "nolatent"])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    t = time.time()
    print("devices:", jax.devices(), flush=True)
    mark("devices", t)

    # sacrificial tiny program — gotcha 9's ~100 s per-process mode
    t = time.time()
    x = jnp.ones((8, 8))
    float((x @ x).sum())
    mark("tiny_first_program", t)

    t = time.time()
    float((jnp.ones((16, 16)) @ jnp.ones((16, 16))).sum())
    mark("tiny_second_program", t)

    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
    from dreamfusion_tpu.training.trainer import Trainer
    from dreamfusion_tpu.utils.params import cast_f32_fused

    cfg = finalize(Config(
        text="a DSLR photo of a delicious hamburger",
        workspace="/tmp/dftpu_taxprobe", backbone="triplane", seed=0,
        lambda_3d_normal_smooth=0.0, eval_interval=10, ckpt="scratch",
        save_mesh=False, iters=10000,
    ))
    key = jax.random.PRNGKey(0)

    t = time.time()
    g = StableDiffusionGuidance(SDConfig(sd_version=cfg.sd_version,
                                         t_range=cfg.t_range))
    # bf16 slab init (r5): one tiny-HLO program per tower, no cast program
    gp = g.init_params(key, dtype=jnp.bfloat16)
    gp = cast_f32_fused(gp, jnp.bfloat16)  # no-op guard, measures ~0
    if args.mode != "overlap":
        fence(gp["unet"])
    mark("guidance_init_cast", t)

    t = time.time()
    emb = prepare_text_embeddings(g, gp, cfg.text, cfg.negative)
    emb = {k: v.astype(jnp.float32) for k, v in emb.items()}
    if args.mode != "overlap":
        fence(emb)
    mark("text_embed_program", t)

    t = time.time()
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gp},
                 embeddings={"SD": emb})
    state = tr.init_state(key)
    if args.mode != "overlap":
        fence(state.params)
    mark("state_init", t)

    t = time.time()
    grid_fn = tr._make_update_grid()
    state = grid_fn(state, key)
    if args.mode != "overlap":
        fence(state.occ_grid)
    mark("grid_update_first", t)

    steps = []
    if tr._fused_phase_ok():
        steps.append(("fused", tr._make_train_step("fused")))
    else:
        if cfg.latent_iter_ratio > 0 and args.mode != "nolatent":
            steps.append(("latent", tr._make_train_step("latent")))
        steps.append(("main", tr._make_train_step("main")))

    metrics_list = []
    for name, fn in steps:
        t = time.time()
        state, metrics = fn(state, key)
        metrics_list.append((name, metrics))
        if args.mode != "overlap":
            float(metrics["loss"])
        mark(f"{name}_step_first", t)
        t = time.time()
        state, metrics = fn(state, jax.random.fold_in(key, 1))
        if args.mode != "overlap":
            float(metrics["loss"])
        mark(f"{name}_step_second", t)

    t = time.time()
    view_fn = tr._get_view_fn(cfg.H, cfg.W, quantized=True)
    img, _, _ = view_fn(state.ema_params, state.occ_grid,
                        cfg.default_radius, cfg.default_polar, 0.0, key)
    if args.mode != "overlap":
        float(jnp.sum(img.astype(jnp.float32)))
    mark("eval_view_first", t)

    if args.mode == "overlap":
        # one fence drains the whole queue: compare total vs seq's total
        t = time.time()
        for name, m in metrics_list:
            float(m["loss"])
        float(jnp.sum(img.astype(jnp.float32)))
        mark("single_drain_fence", t)

    T["total_s"] = round(time.time() - _t0, 1)
    T["mode"] = args.mode
    print(json.dumps(T), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(T, f, indent=1)


if __name__ == "__main__":
    main()
