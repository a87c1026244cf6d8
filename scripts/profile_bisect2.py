"""Finer forward-pass bisect: which half of loss_fn costs 100+ ms?

Variants (all jitted, all forward-only):
  A  batch+choices sampling only
  B  A + render (traced shading/use_bg_net/max_level, exactly as the step)
  C  B + regularizers (entropy/opacity/orient)
  D  guidance-only on a synthetic image (resize+VAE+UNet+SDS loss)
  E  full loss_fn forward (= bisect loss_fwd)
"""

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
    from dreamfusion_tpu.training.trainer import Trainer
    from dreamfusion_tpu.models.renderer import RenderFlags
    from dreamfusion_tpu.training import schedules
    from dreamfusion_tpu.training.data import sample_train_batch
    from dreamfusion_tpu.core.math import safe_normalize

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

    H, W = cfg.h, cfg.w
    flags = RenderFlags(perturb=True, need_loss_orient=cfg.lambda_orient > 0)

    def stage_a(params, state, key):
        k_batch, k_choice, k_render, k_guide, k_tv = jax.random.split(key, 5)
        r_exp = schedules.iter_ratio(state.step, 0, cfg.iters)
        batch = sample_train_batch(k_batch, cfg, H, W, None, None, None, None)
        choices = schedules.sample_step_choices(cfg, k_choice, r_exp)
        max_level = schedules.encoder_max_level(cfg, r_exp)
        return batch, choices, max_level, (k_render, k_guide)

    def render_part(params, state, key):
        batch, choices, max_level, (k_render, k_guide) = stage_a(
            params, state, key)
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
        return out, batch, k_guide, B

    @jax.jit
    def var_a(params, state, key):
        batch, choices, max_level, _ = stage_a(params, state, key)
        return (jnp.sum(batch.rays_o) + jnp.sum(choices.bg_color) +
                jnp.sum(batch.mvp))

    @jax.jit
    def var_b(params, state, key):
        out, batch, k_guide, B = render_part(params, state, key)
        return jnp.sum(out["image"]) + jnp.sum(out["weights_sum"])

    @jax.jit
    def var_c(params, state, key):
        out, batch, k_guide, B = render_part(params, state, key)
        wsum = out["weights_sum"].reshape(B, H, W)
        loss = jnp.sum(out["image"]) * 1e-6
        loss = loss + cfg.lambda_opacity * jnp.mean(wsum ** 2)
        a = jnp.clip(out["weights"], 1e-5, 1 - 1e-5)
        ent = jnp.mean(-a * jnp.log2(a) - (1 - a) * jnp.log2(1 - a))
        loss = loss + schedules.lambda_entropy_at(cfg, state.step) * ent
        loss = loss + cfg.lambda_orient * out["loss_orient"]
        return loss

    @jax.jit
    def var_d(gparams, key, img, az):
        from dreamfusion_tpu.training.data import CameraBatch
        batch = CameraBatch(None, None, None, None,
                            jnp.zeros((1,)), az, jnp.zeros((1,)))
        return tr._guidance_loss(gparams, key, img, batch,
                                 as_latent=False)

    @jax.jit
    def var_e(params, state, key, gparams):
        out, batch, k_guide, B = render_part(params, state, key)
        image = out["image"].reshape(B, H, W, 3)
        wsum = out["weights_sum"].reshape(B, H, W)
        loss = tr._guidance_loss(gparams, k_guide, image, batch,
                                 as_latent=False)
        loss = loss + cfg.lambda_opacity * jnp.mean(wsum ** 2)
        a = jnp.clip(out["weights"], 1e-5, 1 - 1e-5)
        ent = jnp.mean(-a * jnp.log2(a) - (1 - a) * jnp.log2(1 - a))
        loss = loss + schedules.lambda_entropy_at(cfg, state.step) * ent
        loss = loss + cfg.lambda_orient * out["loss_orient"]
        return loss

    results = {}
    results["A_batch_sampling"] = timeit(
        var_a, lambda i: (state.params, state, jax.random.PRNGKey(i)))
    print("A", results["A_batch_sampling"] * 1e3, flush=True)
    results["B_plus_render"] = timeit(
        var_b, lambda i: (state.params, state, jax.random.PRNGKey(i)))
    print("B", results["B_plus_render"] * 1e3, flush=True)
    results["C_plus_regs"] = timeit(
        var_c, lambda i: (state.params, state, jax.random.PRNGKey(i)))
    print("C", results["C_plus_regs"] * 1e3, flush=True)

    gp_dev = tr._guidance_params_on_device()

    def d_args(i):
        k = jax.random.PRNGKey(i)
        img = jax.random.uniform(k, (1, H, W, 3))
        az = jax.random.uniform(k, (1,), minval=-180.0, maxval=180.0)
        return gp_dev, k, img, az

    results["D_guidance_only"] = timeit(var_d, d_args)
    print("D", results["D_guidance_only"] * 1e3, flush=True)
    results["E_full_fwd"] = timeit(
        var_e, lambda i: (state.params, state, jax.random.PRNGKey(i), gp_dev))

    print("\n==== fine bisect (ms) ====")
    for k, v in results.items():
        print(f"{k:18s} {v * 1e3:9.1f}")


if __name__ == "__main__":
    main()
