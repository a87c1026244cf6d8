"""Bisect inside StableDiffusionGuidance.sds_loss: where do 70 ms go?

  G1 resize 64->512 + VAE encode (sample) only
  G2 G1 + add_noise + CFG batch assembly
  G3 G2 + UNet forward
  G4 full sds_loss (as the trainer calls it, incl. view embedding lerp)
  G5 UNet alone, fp32 latents input (dtype-sensitivity check)
  G6 UNet alone, bf16 latents input (the earlier component test)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, make_args, reps=8, warmup=2):
    # pre-materialize every argument tuple BEFORE timing: eager arg
    # creation is itself a remote dispatch on this backend and otherwise
    # pollutes (or pipelines under) the measurement
    argsets = [make_args(100 + i) for i in range(reps)]
    jax.block_until_ready(argsets)
    for i in range(warmup):
        out = fn(*argsets[i % reps])
    jax.block_until_ready(out)
    t0 = time.time()
    for a in argsets:
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance

    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    g = StableDiffusionGuidance(SDConfig(sd_version="2.1"))
    key = jax.random.PRNGKey(0)
    gp = g.init_params(key)
    gp = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x, gp)
    emb = prepare_text_embeddings(g, gp, "a highly detailed hamburger")
    emb = {k: v.astype(jnp.float32) for k, v in emb.items()}
    gp = jax.device_put(gp)
    H = W = 64
    B = 1

    @jax.jit
    def g1(gp, key, img):
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        lat = g._to_latents(gp, k_enc, img, False)
        return jnp.sum(lat)

    @jax.jit
    def g2(gp, key, img):
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        lat = g._to_latents(gp, k_enc, img, False)
        t = g._sample_t(k_t, B)
        noise = jax.random.normal(k_noise, lat.shape)
        lat_noisy = jax.lax.stop_gradient(g.schedule.add_noise(lat, noise, t))
        x_in = jnp.concatenate([lat_noisy] * 2)
        return jnp.sum(x_in) + jnp.sum(t)

    @jax.jit
    def g3(gp, key, img, ctx):
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        lat = g._to_latents(gp, k_enc, img, False)
        t = g._sample_t(k_t, B)
        noise = jax.random.normal(k_noise, lat.shape)
        lat_noisy = jax.lax.stop_gradient(g.schedule.add_noise(lat, noise, t))
        x_in = jnp.concatenate([lat_noisy] * 2)
        t_in = jnp.concatenate([t] * 2)
        eps = g.unet.apply({"params": gp["unet"]}, x_in, t_in, ctx)
        return jnp.sum(eps.astype(jnp.float32))

    @jax.jit
    def g4(gp, key, img, az):
        from dreamfusion_tpu.guidance.perpneg import interpolate_view_embedding
        cond = interpolate_view_embedding(emb, az)
        uncond = jnp.tile(emb["uncond"], (B, 1, 1))
        return g.sds_loss(gp, key, cond, uncond, img, guidance_scale=100.0)

    @jax.jit
    def g5(gp, lat, t, ctx):
        x_in = jnp.concatenate([lat] * 2)
        t_in = jnp.concatenate([t] * 2)
        eps = g.unet.apply({"params": gp["unet"]}, x_in, t_in, ctx)
        return jnp.sum(eps.astype(jnp.float32))

    ctx0 = jnp.concatenate([emb["uncond"], emb["default"]])

    def img_args(i):
        k = jax.random.PRNGKey(i)
        return gp, k, jax.random.uniform(k, (B, H, W, 3))

    results = {}
    results["G1_resize_vae"] = timeit(g1, img_args)
    print("G1", results["G1_resize_vae"] * 1e3, flush=True)
    results["G2_plus_noise"] = timeit(g2, img_args)
    print("G2", results["G2_plus_noise"] * 1e3, flush=True)
    results["G3_plus_unet"] = timeit(
        g3, lambda i: (*img_args(i), ctx0))
    print("G3", results["G3_plus_unet"] * 1e3, flush=True)
    results["G4_full_sds"] = timeit(
        g4, lambda i: (*img_args(i),
                       jax.random.uniform(jax.random.PRNGKey(i), (B,),
                                          minval=-180.0, maxval=180.0)))
    print("G4", results["G4_full_sds"] * 1e3, flush=True)

    def lat_args(dtype):
        def f(i):
            k = jax.random.PRNGKey(i)
            lat = jax.random.normal(k, (B, 64, 64, 4), dtype)
            t = jnp.full((B,), (i * 37) % 1000)
            return gp, lat, t, ctx0
        return f

    results["G5_unet_f32in"] = timeit(g5, lat_args(jnp.float32))
    print("G5", results["G5_unet_f32in"] * 1e3, flush=True)
    results["G6_unet_bf16in"] = timeit(g5, lat_args(jnp.bfloat16))

    print("\n==== guidance bisect (ms) ====")
    for k, v in results.items():
        print(f"{k:18s} {v * 1e3:9.1f}")


if __name__ == "__main__":
    main()
