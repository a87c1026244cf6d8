"""Scan-chained bisect of the FULL train step (dispatch-artifact-proof).

Per-iter cost from (scan9 - scan1)/8, with TrainState threaded as carry:
  T1 real step: grad(full loss incl. SDS) + Adan + EMA  (= bench ground truth)
  T2 no-guidance step: same but SDS replaced by sum(image)*1e-6
  T3 optimizer-only: fixed grads -> Adan + EMA

Known from profile_scan.py: sds fwd 66 ms, sds grad 85 ms per iter.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def scan_time(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
        float(out[1] if isinstance(out, tuple) else out)
    return (time.time() - t0) / reps


def main():
    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.core.math import safe_normalize
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
    from dreamfusion_tpu.models.renderer import RenderFlags
    from dreamfusion_tpu.training import schedules
    from dreamfusion_tpu.training.data import sample_train_batch
    from dreamfusion_tpu.training.trainer import Trainer, apply_updates_guarded

    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    cfg = finalize(Config(
        text="a highly detailed hamburger", workspace="/tmp/dftpu_prof",
        backbone="triplane", w=64, h=64,
        latent_iter_ratio=0.0, fp16=True, seed=0,
        lambda_3d_normal_smooth=0.0))
    g = StableDiffusionGuidance(SDConfig(sd_version="2.1"))
    key = jax.random.PRNGKey(0)
    gp = g.init_params(key)
    gp = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x, gp)
    emb = prepare_text_embeddings(g, gp, cfg.text)
    emb = {k: v.astype(jnp.float32) for k, v in emb.items()}
    gp = jax.device_put(gp)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gp},
                 embeddings={"SD": emb})
    state0 = tr.init_state(key)
    jax.block_until_ready(state0.params)

    H, W = cfg.h, cfg.w

    def loss_fn(params, state, key, gparams, use_guidance,
                use_orient=True, use_entropy=True, use_shading=True):
        flags = RenderFlags(perturb=True, need_loss_orient=use_orient,
                            shading_static_albedo=not use_shading)
        k_batch, k_choice, k_render, k_guide, _ = jax.random.split(key, 5)
        r_exp = schedules.iter_ratio(state.step, 0, cfg.iters)
        batch = sample_train_batch(k_batch, cfg, H, W, None, None, None, None)
        choices = schedules.sample_step_choices(cfg, k_choice, r_exp)
        max_level = schedules.encoder_max_level(cfg, r_exp)
        B = batch.rays_o.shape[0]
        ro = batch.rays_o.reshape(-1, 3)
        rd = batch.rays_d.reshape(-1, 3)
        light_d = safe_normalize(ro + choices.light_noise)
        bg = jnp.broadcast_to(choices.bg_color, ro.shape)
        out = tr.renderer.apply(
            {"params": params}, flags, ro, rd, occ_grid=state.occ_grid,
            light_d=light_d, ambient_ratio=choices.ambient_ratio,
            shading=choices.shading, bg_color=bg, max_level=max_level,
            use_bg_net=choices.use_bg_net,
            rngs={"render": k_render}, method=tr.renderer.render)
        image = out["image"].reshape(B, H, W, 3)
        wsum = out["weights_sum"].reshape(B, H, W)
        if use_guidance:
            loss = tr._guidance_loss(gparams, k_guide, image, batch,
                                     as_latent=False)
        else:
            loss = jnp.sum(image) * 1e-6
        loss = loss + cfg.lambda_opacity * jnp.mean(wsum ** 2)
        if use_entropy:
            a = jnp.clip(out["weights"], 1e-5, 1 - 1e-5)
            ent = jnp.mean(-a * jnp.log2(a) - (1 - a) * jnp.log2(1 - a))
            loss = loss + schedules.lambda_entropy_at(cfg, state.step) * ent
        if use_orient:
            loss = loss + cfg.lambda_orient * out["loss_orient"]
        return loss

    def make_step_scan(K, use_guidance, use_orient=True, use_entropy=True,
                       use_shading=True):
        @jax.jit
        def run(state, gparams, key0):
            def body(state, i):
                k = jax.random.fold_in(key0, i)
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, state, k, gparams, use_guidance,
                    use_orient, use_entropy, use_shading)
                state = apply_updates_guarded(tr.optimizer, cfg, state, grads)
                return state, loss
            state, losses = jax.lax.scan(body, state, jnp.arange(K))
            return state.step, jnp.sum(losses)
        return run

    def make_opt_scan(K):
        @jax.jit
        def run(state, key0):
            grads0 = jax.tree.map(
                lambda p: jnp.full_like(p, 1e-6), state.params)
            def body(state, i):
                g = jax.tree.map(
                    lambda x: x * (1.0 + 1e-3 * jnp.float32(i)), grads0)
                state = apply_updates_guarded(tr.optimizer, cfg, state, g)
                return state, jnp.float32(0)
            state, _ = jax.lax.scan(body, state, jnp.arange(K))
            import optax
            return state.step, optax.global_norm(state.params)
        return run

    # sacrifice a tiny program first: the FIRST executable a process runs
    # through the tunnel shows a pathological ~100 s/call mode (measured in
    # S1/T3); absorb it here so real measurements are clean
    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    gpd = {"SD": gp}
    results = {}
    for name, make, args in [
        ("T3_opt_only", lambda K: make_opt_scan(K),
         (state0, jax.random.PRNGKey(3))),
        ("T2_step_noguid", lambda K: make_step_scan(K, False),
         (state0, gpd, jax.random.PRNGKey(4))),
        ("T4_noguid_noorient", lambda K: make_step_scan(K, False, False),
         (state0, gpd, jax.random.PRNGKey(6))),
        ("T5_noguid_bare", lambda K: make_step_scan(K, False, False, False),
         (state0, gpd, jax.random.PRNGKey(7))),
        ("T6_noguid_albedo",
         lambda K: make_step_scan(K, False, False, True, False),
         (state0, gpd, jax.random.PRNGKey(8))),
        ("T1_step_full", lambda K: make_step_scan(K, True),
         (state0, gpd, jax.random.PRNGKey(5))),
    ]:
        t1 = scan_time(make(1), *args)
        t9 = scan_time(make(9), *args)
        per = (t9 - t1) / 8
        results[name] = per
        print(f"{name:16s} scan1={t1*1e3:8.1f}ms scan9={t9*1e3:8.1f}ms "
              f"per-iter={per*1e3:8.1f}ms", flush=True)

    print("\n==== per-iter (ms) ====")
    for k, v in results.items():
        print(f"{k:16s} {v*1e3:9.1f}")


if __name__ == "__main__":
    main()
