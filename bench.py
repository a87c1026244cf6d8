"""Benchmark: fused SDS iterations/sec on the flagship configuration.

Measures the full jitted train step — pose sampling, occupancy-grid NeRF
render at the training resolution, VAE encode (with grad), real-size SD
UNet CFG pass, SDS loss, backward, Adan update, EMA — on the attached TPU.
Guidance weights are randomly initialized (no egress) but *architecture-
and-size exact* for SD 2.1, so the measured step cost equals the real
workload's.

Baseline: the driver's north star (BASELINE.md) — 10k steps in <= 15 min
on v5p-8, i.e. 11.11 it/s. vs_baseline = measured_it_s / 11.11 (values > 1
beat the target; this machine has a single v5e-lite chip, ~1/8 of the
north-star topology).

Flagship backbone is the TPU-first triplane encoder (ops/triplane.py).
Measured on this chip (64² renders, full SD 2.1 guidance):
  91 s/step  initial (lax.conv UNet + hash grid + FD normals)
  8.5 s/step after MXU matmul convs + autograd normals (grid backbone)
  0.82 s/step triplane backbone  → 1.21 it/s
  0.18 s/step quad-packed gathers → 5.58 it/s
  0.16 s/step chunked-softmax attention → 6.20 it/s
  0.14 s/step size-dispatched convs → 7.13 it/s
  0.087 s/step quality-swept sample budgets (32/32) → 11.53 it/s (> north
  star 11.11); remaining budget is guidance-dominated (UNet CFG ~25 ms +
  VAE encode fwd+bwd ~20 ms, near compute-bound) + render ~35 ms.
`--backbone grid` benches the Instant-NGP-parity path: 2.19 it/s with the
default affine-hash packed encoding, 0.852 with `--grid_hash xor` (tcnn
parity — floor-bound by its 93 backward-scatter rows/sample at ~60 ns).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_IT_S = 10000.0 / (15.0 * 60.0)  # 11.11 it/s


def run_bench(smoke: bool = False, steps: int = 20, render_hw: int = 64,
              merge: bool = False,
              backbone: str = "grid", fine_steps: int = 0,
              coarse_steps: int = 0, triplane_scales: int = 0,
              grid_hash: str = "", split_step: bool = False,
              grid_levels: int = 0, grid_features: int = 0):
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the full-size SD UNet + NeRF fused step
    # takes tens of minutes to compile through the TPU tunnel on a cold
    # cache; warm runs (including the driver's) load it in seconds.  The
    # package __init__ configures jax_compilation_cache_dir from
    # DFTPU_COMPILE_CACHE (default ~/.cache/dftpu_xla) — don't set a second
    # divergent cache here (it would be overwritten by the import below).
    from dreamfusion_tpu.config import Config, finalize
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
    from dreamfusion_tpu.training.trainer import Trainer

    if smoke:
        cfg = finalize(Config(
            text="a hamburger", workspace="/tmp/dftpu_bench",
            backbone="grid", w=16, h=16, latent_iter_ratio=0.0,
            grid_levels=4, grid_log2_hashmap_size=8,
            grid_desired_resolution=64, grid_size=32,
            grid_coarse_steps=16, grid_fine_steps=16,
            hidden_dim=16, num_layers=2, fp16=False, seed=0,
            lambda_3d_normal_smooth=0.0,
        ))
        sdc = SDConfig(tiny=True, image_size=16, latent_size=8)
        steps = min(steps, 5)
    else:
        extra = {}
        if fine_steps:
            extra["grid_fine_steps"] = fine_steps
        if coarse_steps:
            extra["grid_coarse_steps"] = coarse_steps
        if triplane_scales:
            extra["triplane_scales"] = triplane_scales
        if grid_hash:
            extra["grid_hash"] = grid_hash
        if grid_levels:
            extra["grid_levels"] = grid_levels
        if grid_features:
            extra["grid_features_per_level"] = grid_features
        if split_step:
            extra["split_step"] = True
        if merge:
            extra["merge_phases"] = True
        # latent_iter_ratio stays at the flagship default so the benched
        # executable IS the flagship's fused warmup+main program (same
        # compile-cache entry; the timed steps run in the main branch —
        # see the step-counter jump below)
        cfg = finalize(Config(
            text="a highly detailed hamburger", workspace="/tmp/dftpu_bench",
            backbone=backbone, w=render_hw, h=render_hw,
            fp16=True, seed=0,
            lambda_3d_normal_smooth=0.0, **extra,
        ))
        sdc = SDConfig(sd_version="2.1")

    import sys
    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    key = jax.random.PRNGKey(0)
    g = StableDiffusionGuidance(sdc)
    note("init guidance params...")
    # frozen guidance in bf16 (reference runs fp16 guidance, main.py:172),
    # generated directly in bf16 — one slab program per tower, no separate
    # cast program (first-execution cost is per-program, gotcha 9)
    gp = g.init_params(key, dtype=None if smoke else jnp.bfloat16)
    emb = prepare_text_embeddings(g, gp, cfg.text)
    emb = {k: v.astype(jnp.float32) for k, v in emb.items()}

    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gp},
                 embeddings={"SD": emb})
    note("init NeRF state...")
    state = tr.init_state(key)
    if tr._fused_phase_ok():
        # the program the flagship actually dispatches; jump the step
        # counter past the warmup boundary so the timed iterations take
        # the MAIN branch (the 80% regime: VAE encode + full guidance)
        step_fn = tr._make_train_step("fused")
        state = state.replace(step=jnp.asarray(
            int(cfg.iters * cfg.latent_iter_ratio) + 1, jnp.int32))
        note("fused warmup+main program (timing the main branch)")
    else:
        step_fn = tr._make_train_step("main")
    update_grid = tr._make_update_grid()

    # warmup/compile
    import time as _t
    t = _t.time()
    note("compiling density-grid update...")
    state = update_grid(state, jax.random.PRNGKey(1))
    jax.block_until_ready(state.mean_density)
    note(f"grid update compiled+ran in {_t.time()-t:.1f}s")
    t = _t.time()
    note("compiling fused train step...")
    state, metrics = step_fn(state, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics["loss"])
    note(f"train step compiled+ran in {_t.time()-t:.1f}s")

    flops = _step_flops(step_fn, state, note)
    return _timed_repeats(step_fn, state, steps, note,
                          update_grid=update_grid,
                          update_interval=cfg.update_extra_interval), flops


def _step_flops(step_fn, state, note) -> float:
    """FLOPs of one fused step from XLA's own cost model
    (compiled.cost_analysis()) — feeds the tflops_per_s / mfu fields
    (VERDICT r4 item 3).  The lower().compile() hits the in-process /
    persistent compile cache (identical HLO), so this is bookkeeping, not
    a second compile."""
    import jax
    try:
        lowered = step_fn.jitted.lower(state, jax.random.PRNGKey(2),
                                       step_fn.gp_dev, step_fn.emb_dev)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        note(f"cost_analysis: {flops / 1e12:.3f} TFLOP/step")
        return flops
    except Exception as e:  # backend without cost_analysis support
        note(f"cost_analysis unavailable ({type(e).__name__}: {e})")
        return 0.0


def _timed_repeats(step_fn, state, steps: int, note, update_grid=None,
                   update_interval: int = 16):
    """Shared warm-block + 3-timed-repeat harness.

    Untimed warm blocks: the first CHAINED dispatch sequences after
    compile ramp through the tunnel's pathological slow mode (gotcha 9 —
    measured ramp on a fresh process: 0.03 → 2.7 → 6.7 → 11.6 it/s over
    successive blocks; BENCH_r02's repeat 0 read 0.092 it/s inside the
    measurement).  Warm until the block rate stops improving by >1.3×
    (steady state), max 6 blocks.  Then 3 timed repeats — the tunnel adds
    ~10% run-to-run jitter; the caller reports the MEDIAN as headline.
    float() — NOT block_until_ready — forces the chain: on this backend
    block_until_ready can return early on chained multi-program futures
    (measured 0.04 s "wait" for 131 s of real work, CLAUDE.md gotcha 7)."""
    import time as _t

    import jax
    # one base key per block: the jitted step folds state.step internally,
    # so re-passing the same buffers costs zero per-step host RNG RPCs
    # (mirrors Trainer.train's dispatch pattern)
    warm_n = max(3, min(steps // 2, 8))
    prev = 0.0
    for wrep in range(6):
        kb = jax.random.PRNGKey(50 + wrep)
        t0 = _t.time()
        for i in range(warm_n):
            state, metrics = step_fn(state, kb)
        float(metrics["loss"])
        rate = warm_n / (_t.time() - t0)
        note(f"warm block {wrep}: {rate:.3f} it/s")
        if prev > 0 and rate < 1.3 * prev:
            break
        prev = rate
    repeats = []
    for rep in range(3):
        kb = jax.random.PRNGKey(200 + rep)
        t0 = _t.time()
        for i in range(steps):
            if update_grid is not None and i % update_interval == 0:
                state = update_grid(state, kb)
            state, metrics = step_fn(state, kb)
        float(metrics["loss"])
        dt = _t.time() - t0
        note(f"repeat {rep}: {steps / dt:.3f} it/s")
        repeats.append(steps / dt)
    return repeats


def run_bench_dmtet(steps: int = 20, smoke: bool = False):
    """Stage-2 (DMTet) train step at the reference's 512² stage-2
    resolution (main.py:253-274 scales h,w by dmtet_reso_scale=8):
    marching tets → tile rasterization → texture query → SDS on the full
    SD 2.1 tower → Adan.  Sphere-init geometry (step cost does not depend
    on the converged shape; the tri budget is static)."""
    import jax
    import jax.numpy as jnp

    from dreamfusion_tpu.config import Config, apply_dmtet, finalize
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
    from dreamfusion_tpu.training.dmtet_trainer import DMTetTrainer

    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    if smoke:
        cfg = finalize(apply_dmtet(Config(
            text="a hamburger", workspace="/tmp/dftpu_bench_dmtet",
            backbone="triplane", w=4, h=4, dmtet_reso_scale=8.0,
            tet_grid_size=16, latent_iter_ratio=0.0, fp16=False, seed=0,
            use_tensorboard=False)))
        sdc = SDConfig(tiny=True, image_size=16, latent_size=8)
        steps = min(steps, 5)
    else:
        cfg = finalize(apply_dmtet(Config(
            text="a highly detailed hamburger",
            workspace="/tmp/dftpu_bench_dmtet",
            backbone="triplane", w=64, h=64,   # ×8 → 512² stage-2 res
            latent_iter_ratio=0.0, fp16=True, seed=0,
            use_tensorboard=False)))
        sdc = SDConfig(sd_version="2.1")

    key = jax.random.PRNGKey(0)
    g = StableDiffusionGuidance(sdc)
    note("init guidance params...")
    gp = g.init_params(key)
    if not smoke:
        from dreamfusion_tpu.utils.params import cast_f32_fused
        gp = cast_f32_fused(gp, jnp.bfloat16)
    emb = prepare_text_embeddings(g, gp, cfg.text)
    emb = {k: v.astype(jnp.float32) for k, v in emb.items()}
    tr = DMTetTrainer(cfg, guidances={"SD": g}, guidance_params={"SD": gp},
                      embeddings={"SD": emb})
    note("init DMTet state (sphere sdf)...")
    state = tr.init_state(key)
    step_fn = tr._make_train_step("main")
    import time as _t
    t = _t.time()
    note("compiling dmtet train step...")
    state, metrics = step_fn(state, jax.random.PRNGKey(2))
    float(metrics["loss"])
    note(f"dmtet step compiled+ran in {_t.time()-t:.1f}s")
    return _timed_repeats(step_fn, state, steps, note)


def run_bench_zero123(steps: int = 20, smoke: bool = False):
    """Image-conditioned (zero-1-to-3) SDS step at full size: 64² render →
    256² zero123 ldm UNet with hybrid image+pose conditioning (reference
    guidance/zero123_utils.py:113-231), image-mode lambdas
    (config.apply_image_mode).  Synthetic reference image (no egress);
    random ldm weights are architecture-exact so the step cost is real."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dreamfusion_tpu.config import Config, apply_image_mode, finalize
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from dreamfusion_tpu.guidance.zero123 import (Zero123Config,
                                                  Zero123Guidance)
    from dreamfusion_tpu.training.image_data import RefImages
    from dreamfusion_tpu.training.trainer import Trainer

    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    if smoke:
        base = Config(
            text=None, image="synthetic", workspace="/tmp/dftpu_bench_z123",
            backbone="grid", w=16, h=16, grid_levels=4,
            grid_log2_hashmap_size=8, grid_desired_resolution=64,
            grid_size=32, grid_coarse_steps=16, grid_fine_steps=16,
            hidden_dim=16, num_layers=2, fp16=False, seed=0,
            use_tensorboard=False)
        zc = Zero123Config(tiny=True)
        K = 32
        steps = min(steps, 5)
    else:
        base = Config(
            text=None, image="synthetic", workspace="/tmp/dftpu_bench_z123",
            backbone="triplane", w=64, h=64, fp16=True, seed=0,
            use_tensorboard=False)
        zc = Zero123Config()
        K = 256
    cfg = finalize(apply_image_mode(base))

    # synthetic reference view: a centered smooth blob (content does not
    # affect step time; shapes/dtypes match preprocess_image.py output)
    yy, xx = np.mgrid[0:K, 0:K].astype(np.float32) / K - 0.5
    r2 = xx ** 2 + yy ** 2
    rgb = np.stack([np.exp(-8 * r2)] * 3, -1).astype(np.float32)
    mask = r2 < 0.2
    ref = RefImages(rgb=rgb[None], mask=mask[None],
                    depth=np.sqrt(np.maximum(0.04 - r2, 0))[None],
                    normal=None)

    key = jax.random.PRNGKey(0)
    g = Zero123Guidance(zc)
    note("init zero123 params...")
    gp = g.init_params(key)
    if not smoke:
        from dreamfusion_tpu.utils.params import cast_f32_fused
        gp = cast_f32_fused(gp, jnp.bfloat16)
    emb = g.prepare_image_embeddings(gp, ref.rgb, ref.polars, ref.azimuths,
                                     ref.radii, ref.weights)
    tr = Trainer(cfg, guidances={"zero123": g},
                 guidance_params={"zero123": gp},
                 embeddings={"zero123": emb}, ref_images=ref)
    note("init NeRF state...")
    state = tr.init_state(key)
    step_fn = tr._make_train_step("main")
    update_grid = tr._make_update_grid() if tr.needs_density_grid else None
    import time as _t
    if update_grid is not None:
        state = update_grid(state, jax.random.PRNGKey(1))
        jax.block_until_ready(state.mean_density)
    t = _t.time()
    note("compiling zero123 train step...")
    state, metrics = step_fn(state, jax.random.PRNGKey(2))
    float(metrics["loss"])
    note(f"zero123 step compiled+ran in {_t.time()-t:.1f}s")
    return _timed_repeats(step_fn, state, steps, note,
                          update_grid=update_grid,
                          update_interval=cfg.update_extra_interval)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-runnable variant")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--fine", type=int, default=0)
    ap.add_argument("--coarse", type=int, default=0)
    ap.add_argument("--scales", type=int, default=0)
    ap.add_argument("--grid_hash", type=str, default="",
                    help="affine (default) | xor (tcnn-parity hashing)")
    ap.add_argument("--grid_levels", type=int, default=0,
                    help="hashgrid level count (default Config's 16)")
    ap.add_argument("--grid_features", type=int, default=0,
                    help="hashgrid features per level (default 2)")
    ap.add_argument("--backbone", type=str, default="triplane",
                help="triplane (TPU-first flagship) | grid | vanilla")
    ap.add_argument("--merge", action="store_true",
                    help="bench the merge_phases fused warmup+main "
                         "executable (A/B: its lax.cond measured ~20% "
                         "slower steady than the separate main program, "
                         "10.0 vs 12.56 it/s — why merge_phases defaults "
                         "off)")
    ap.add_argument("--split", action="store_true",
                    help="bench the 3-program split step instead of fused")
    ap.add_argument("--stage", type=str, default="nerf",
                    choices=["nerf", "dmtet"],
                    help="dmtet = stage-2 step at the reference's 512² "
                         "stage-2 resolution")
    ap.add_argument("--guidance", type=str, default="SD",
                    choices=["SD", "zero123"],
                    help="zero123 = image-conditioned SDS (full-size ldm "
                         "UNet, hybrid image+pose conditioning)")
    args = ap.parse_args()

    if args.smoke:
        from dreamfusion_tpu.utils.platform import force_cpu
        force_cpu()

    if args.stage == "dmtet":
        metric = "dmtet_sds_iterations_per_sec"
        repeats = run_bench_dmtet(steps=args.steps, smoke=args.smoke)
    elif args.guidance == "zero123":
        metric = "zero123_sds_iterations_per_sec"
        repeats = run_bench_zero123(steps=args.steps, smoke=args.smoke)
    else:
        metric = "sds_iterations_per_sec"
        repeats, flops = run_bench(
            smoke=args.smoke, steps=args.steps,
            render_hw=args.hw,
            backbone=args.backbone, fine_steps=args.fine,
            coarse_steps=args.coarse,
            triplane_scales=args.scales,
            grid_hash=args.grid_hash,
            split_step=args.split,
            merge=args.merge,
            grid_levels=args.grid_levels,
            grid_features=args.grid_features)
    # headline = MEDIAN of the timed repeats (VERDICT r2: best-of-3 hid a
    # below-north-star median); best + all repeats reported alongside.
    it_s = sorted(repeats)[len(repeats) // 2]
    out = {
        "metric": metric,
        "value": round(it_s, 3),
        "unit": "it/s",
        "best": round(max(repeats), 3),
        "repeats": [round(r, 3) for r in repeats],
    }
    if metric == "sds_iterations_per_sec":
        # the 11.11 it/s north star is defined for the NeRF+SD step only;
        # a ratio against it is meaningless for dmtet/zero123 (ADVICE r3)
        out["vs_baseline"] = round(it_s / BASELINE_IT_S, 3)
        if flops > 0 and not args.smoke:
            # achieved TFLOP/s + model FLOPs utilization vs the v5e bf16
            # peak (197 TFLOP/s; the bench chip is a TPU v5 lite).  XLA's
            # cost model counts every op's FLOPs in the fused step —
            # render fwd+bwd, UNet CFG-2, VAE enc fwd+bwd, Adan.
            tflops = flops * it_s / 1e12
            out["tflops_per_s"] = round(tflops, 2)
            out["flops_per_step"] = flops
            out["mfu"] = round(tflops / 197.0, 4)
            if out["mfu"] < 0.30 and args.backbone == "triplane" and \
                    not (args.split or args.merge):
                # the two biggest under-utilized components, from the
                # scan-chained step budget (CLAUDE.md gotchas 11/13)
                out["mfu_under_utilized"] = [
                    "render march+field: ~35 ms/step of gather/scatter-"
                    "bound triplane lookups at ~zero MXU FLOPs "
                    "(scripts/profile_step_scan.py)",
                    "VAE-encoder backward: ~12 ms/step of whole-graph "
                    "scheduling overhead beyond the per-op sum "
                    "(scripts/profile_vae_matrix.py)",
                ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
