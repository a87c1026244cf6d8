"""Scan-chained budget split of the SDS guidance grad (S3 = 48.7 ms/iter,
scripts/profile_norm_scan.py baseline A).

Components, each timed as K data-dependent scan iterations inside one jit
(CLAUDE.md gotcha 7 — host-loop timings of independent dispatches under-read
10-30x):
  U   UNet CFG fwd        (batch 2, 64^2 latents)
  V   VAE encode fwd      (512^2 in, sampled latents out)
  VG  grad of VAE encode  (fwd+bwd wrt the 512^2 image)
  R   resize 64^2 -> 512^2 fwd
  S3  full sds grad       (= everything above + schedule/loss glue)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def scan_time(make_fn, K, *args):
    fn = jax.jit(make_fn(K))
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        float(out)
    return (time.time() - t0) / reps


def per_iter(make_fn, *args):
    t1 = scan_time(make_fn, 1, *args)
    t9 = scan_time(make_fn, 9, *args)
    return (t9 - t1) / 8, t1, t9


def main():
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
    from dreamfusion_tpu.ops.resize import resize_bilinear

    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    g = StableDiffusionGuidance(SDConfig(sd_version="2.1"))
    key = jax.random.PRNGKey(0)
    gp = g.init_params(key)
    gp = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x, gp)
    emb = prepare_text_embeddings(g, gp, "a highly detailed hamburger")
    emb = {k: v.astype(jnp.float32) for k, v in emb.items()}
    gp = jax.device_put(gp)
    jax.block_until_ready(gp)
    B, H, W = 1, 64, 64
    LS = g.cfg.latent_size
    IS = g.cfg.image_size

    # sacrificial first program (gotcha 9)
    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3))
    big0 = jax.random.uniform(jax.random.PRNGKey(2), (B, IS, IS, 3))
    lat0 = jax.random.normal(jax.random.PRNGKey(3), (B, LS, LS, 4))

    def chain(body0, x0):
        """K data-dependent iterations of body0: carry perturbs the input."""
        def make(K):
            def run(gp, ctx_c, ctx_u):
                def body(carry, i):
                    s = body0(gp, ctx_c, ctx_u, carry, i)
                    return s, None
                s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
                return s
            return run
        return make

    # U: UNet CFG fwd
    def unet_body(gp, ctx_c, ctx_u, carry, i):
        lat = lat0 + 1e-6 * carry
        x_in = jnp.concatenate([lat] * 2)
        t_in = jnp.full((2 * B,), 500.0 + carry * 0)
        ctx = jnp.concatenate([ctx_u, ctx_c])
        eps = g.unet.apply({"params": gp["unet"]}, x_in, t_in, ctx)
        return jnp.sum(eps.astype(jnp.float32)) * 1e-9 + carry * 0

    # V: VAE encode fwd
    def vae_body(gp, ctx_c, ctx_u, carry, i):
        img = jnp.clip(big0 + 1e-6 * carry, 0, 1)
        lat = g.encode_imgs(gp, jax.random.fold_in(jax.random.PRNGKey(5), i),
                            img)
        return jnp.sum(lat.astype(jnp.float32)) * 1e-9 + carry * 0

    # VG: grad of VAE encode wrt image
    def vaeg_body(gp, ctx_c, ctx_u, carry, i):
        img = jnp.clip(big0 + 1e-6 * carry, 0, 1)

        def f(im):
            lat = g.encode_imgs(gp, jax.random.fold_in(
                jax.random.PRNGKey(5), i), im)
            return jnp.sum(lat.astype(jnp.float32))
        val, grad = jax.value_and_grad(f)(img)
        return val * 1e-9 + jnp.sum(grad.astype(jnp.float32)) * 1e-9

    # R: resize fwd
    def resize_body(gp, ctx_c, ctx_u, carry, i):
        img = jnp.clip(img0 + 1e-6 * carry, 0, 1)
        big = resize_bilinear(img, (IS, IS))
        return jnp.sum(big.astype(jnp.float32)) * 1e-9

    # S3: full sds grad
    def sds_body(gp, ctx_c, ctx_u, carry, i):
        img = jnp.clip(img0 + 1e-6 * carry, 0, 1)
        k = jax.random.fold_in(jax.random.PRNGKey(7), i)

        def one(im):
            return g.sds_loss(gp, k, ctx_c, ctx_u, im, guidance_scale=100.0)
        loss, grad = jax.value_and_grad(one)(img)
        return loss.astype(jnp.float32) + jnp.sum(
            grad.astype(jnp.float32)) * 1e-9

    args = (gp, emb["default"], emb["uncond"])
    for name, body in [("U  unet_cfg_fwd", unet_body),
                       ("V  vae_enc_fwd", vae_body),
                       ("VG vae_enc_grad", vaeg_body),
                       ("R  resize_fwd", resize_body),
                       ("S3 sds_grad", sds_body)]:
        per, t1, t9 = per_iter(chain(body, None), *args)
        print(f"{name:16s} scan1={t1*1e3:8.1f}ms scan9={t9*1e3:8.1f}ms "
              f"per-iter={per*1e3:8.2f}ms", flush=True)


if __name__ == "__main__":
    main()
