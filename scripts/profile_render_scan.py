"""Scan-chained bisect inside the occupancy-grid render path.

Known (profile_step_scan.py): albedo-only no-guidance step = 57 ms,
+normals (lambertian) = 82 ms. Where do the 57 go?

  R1 march_rays_occupancy forward only
  R2 R1 + field forward (encoder+MLP, albedo)
  R3 grad(R2) wrt params        (adds encoder scatter + MLP bwd)
  R4 full render forward (albedo, composite, bg)
  R5 grad(R4) wrt params        (~T6 minus batch-sampling/optimizer)
  R6 grad(full render, lambertian shading) (~T5 minus batch/opt)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("DFTPU_PROF_CPU"):
    jax.config.update("jax_platforms", "cpu")


def scan_time(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        float(out)
    return (time.time() - t0) / reps


def main():
    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.core.math import safe_normalize
    from dreamfusion_tpu.core.sampling import near_far_from_bound
    from dreamfusion_tpu.models.nerf import SHADING_IDS
    from dreamfusion_tpu.models.renderer import RenderFlags
    from dreamfusion_tpu.ops.occupancy import march_rays_occupancy
    from dreamfusion_tpu.training.trainer import Trainer

    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    cfg = finalize(Config(
        text="x", workspace="/tmp/dftpu_prof", backbone="triplane",
        w=64, h=64, fp16=True, seed=0))
    tr = Trainer(cfg, guidances={}, guidance_params={}, embeddings={})
    state = tr.init_state(jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)
    renderer = tr.renderer

    R = cfg.h * cfg.w
    key = jax.random.PRNGKey(1)
    ro = jnp.broadcast_to(jnp.array([0.0, 0.0, 3.2]), (R, 3))
    theta = jnp.linspace(0.3, 0.7, R)
    phi = jnp.linspace(-0.3, 0.3, R)
    rd = safe_normalize(jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi),
         -jnp.cos(theta) * 0.9 - 0.3], axis=-1))
    light_d = safe_normalize(ro)

    def march(k):
        near, far = near_far_from_bound(ro, rd, cfg.bound, kind="cube",
                                        min_near=renderer.min_near)
        return march_rays_occupancy(
            k, ro, rd, near, far, state.occ_grid, cfg.bound,
            n_probe=renderer.grid_probe_steps,
            n_fine=renderer.grid_fine_steps, perturb=True,
            mode=renderer.occupancy_mode, dt_gamma=renderer.dt_gamma)

    def field_fwd(params, k):
        m = march(k)
        xyzs = ro[:, None, :] + rd[:, None, :] * m.z_vals[..., None]
        xyzs = jnp.clip(xyzs, -cfg.bound, cfg.bound).reshape(-1, 3)
        out = renderer.apply({"params": params}, xyzs,
                             method=renderer.density)
        return jnp.sum(out["sigma"]) + jnp.sum(out["albedo"].astype(jnp.float32))

    def full_render(params, k, shading):
        flags = RenderFlags(perturb=True,
                            shading_static_albedo=(shading == "albedo"))
        out = renderer.apply(
            {"params": params}, flags, ro, rd, occ_grid=state.occ_grid,
            light_d=light_d, ambient_ratio=0.5,
            shading=SHADING_IDS["lambertian"],
            bg_color=jnp.zeros((R, 3)), use_bg_net=jnp.asarray(False),
            rngs={"render": k}, method=renderer.render)
        return jnp.sum(out["image"]) + jnp.sum(out["weights_sum"])

    def variants():
        def r1(params, k):
            m = march(k)
            return jnp.sum(m.z_vals) + jnp.sum(m.deltas)
        yield "R1_march_fwd", r1
        yield "R2_field_fwd", field_fwd
        yield "R3_field_grad", lambda params, k: jax.grad(
            lambda p: field_fwd(p, k))(params)
        yield "R4_render_fwd", lambda params, k: full_render(params, k, "albedo")
        yield "R5_render_grad", lambda params, k: jax.grad(
            lambda p: full_render(p, k, "albedo"))(params)
        yield "R6_render_grad_lam", lambda params, k: jax.grad(
            lambda p: full_render(p, k, "lambertian"))(params)

    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    import optax

    def chain(fn, K):
        @jax.jit
        def run(params, key0):
            def body(carry, i):
                k = jax.random.fold_in(key0, i)
                out = fn(params, k)
                if isinstance(out, dict):
                    out = optax.global_norm(out)
                return carry + out.astype(jnp.float32) * 1e-20, None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return s
        return run

    for name, fn in variants():
        try:
            t1 = scan_time(chain(fn, 1), state.params, jax.random.PRNGKey(2))
            t9 = scan_time(chain(fn, 9), state.params, jax.random.PRNGKey(2))
            per = (t9 - t1) / 8
            print(f"{name:20s} scan1={t1*1e3:8.1f} scan9={t9*1e3:8.1f} "
                  f"per-iter={per*1e3:8.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:20s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
