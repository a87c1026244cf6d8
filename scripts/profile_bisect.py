"""Bisect the fused train step: forward-only loss, value_and_grad only,
optimizer only, and the full step — to locate time the component profile
(scripts/profile_step.py) doesn't account for."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, make_args, reps=8, warmup=2):
    for i in range(warmup):
        out = fn(*make_args(i))
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(reps):
        out = fn(*make_args(100 + i))
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
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
    state = tr.init_state(key)

    # rebuild loss_fn exactly as _make_train_step does, via its internals
    step_fn = tr._make_train_step("main")

    # grab the inner loss_fn by re-deriving it: cheapest is to re-create
    # the pieces here mirroring _make_train_step's loss_fn
    from dreamfusion_tpu.models.renderer import RenderFlags
    from dreamfusion_tpu.training import schedules
    from dreamfusion_tpu.training.data import sample_train_batch
    from dreamfusion_tpu.core.math import safe_normalize

    H, W = cfg.h, cfg.w
    flags = RenderFlags(perturb=True, need_loss_orient=cfg.lambda_orient > 0)

    def loss_fn(params, state, key, gparams):
        k_batch, k_choice, k_render, k_guide, k_tv = jax.random.split(key, 5)
        step = state.step
        r_exp = schedules.iter_ratio(step, 0, cfg.iters)
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
        loss = tr._guidance_loss(gparams, k_guide, image, batch,
                                 as_latent=False)
        if cfg.lambda_opacity > 0:
            loss = loss + cfg.lambda_opacity * jnp.mean(wsum ** 2)
        if cfg.lambda_entropy > 0:
            a = jnp.clip(out["weights"], 1e-5, 1 - 1e-5)
            ent = jnp.mean(-a * jnp.log2(a) - (1 - a) * jnp.log2(1 - a))
            loss = loss + schedules.lambda_entropy_at(cfg, step) * ent
        if "loss_orient" in out:
            loss = loss + cfg.lambda_orient * out["loss_orient"]
        return loss

    gp_dev = tr._guidance_params_on_device()

    fwd = jax.jit(loss_fn)
    vag = jax.jit(lambda p, s, k, gpd: jax.value_and_grad(loss_fn)(
        p, s, k, gpd))

    import optax

    @jax.jit
    def opt_only(state, grads):
        return apply_updates_guarded(tr.optimizer, cfg, state, grads)

    results = {}
    results["loss_fwd"] = timeit(
        fwd, lambda i: (state.params, state, jax.random.PRNGKey(i), gp_dev))
    results["loss_fwd_bwd"] = timeit(
        vag, lambda i: (state.params, state, jax.random.PRNGKey(i), gp_dev))
    _, grads = vag(state.params, state, jax.random.PRNGKey(0), gp_dev)
    st = {"s": state}

    def opt_fn(g):
        st["s"] = opt_only(st["s"], g)
        return st["s"].mean_density

    results["optimizer_ema"] = timeit(
        opt_fn, lambda i: (jax.tree.map(lambda x: x * (1.0 + i * 1e-6), grads),))

    def full(k):
        st["s"], m = step_fn(st["s"], k)
        return m["loss"]

    results["full_step"] = timeit(full, lambda i: (jax.random.PRNGKey(i),))

    print("\n==== bisect timings (ms) ====")
    for k, v in results.items():
        print(f"{k:18s} {v * 1e3:9.1f}")


if __name__ == "__main__":
    main()
