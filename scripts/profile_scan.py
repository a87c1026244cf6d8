"""Artifact-proof microbench: time K data-dependent iterations inside ONE
jitted lax.scan, fetch one scalar. Per-iter cost = (t_scanK - t_scan1)/(K-1).

Targets (full-size SD 2.1, bf16 params, 64^2 render / 64^2 latent, B=1):
  S1 UNet CFG-2 forward
  S2 full sds_loss forward (resize + VAE encode + UNet + loss)
  S3 grad of sds_loss wrt the input image (what the train step pays)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def scan_time(make_fn, K, *args):
    """Build scan with K chained iterations, return seconds per call."""
    fn = jax.jit(make_fn(K))
    out = fn(*args)  # compile + run once
    jax.block_until_ready(out)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        float(out)  # force a real fetch every rep
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
    jax.block_until_ready(gp)
    B, H, W = 1, 64, 64
    ctx0 = jnp.concatenate([emb["uncond"], emb["default"]])

    def make_unet(K):
        def run(gp, lat0, ctx):
            def body(carry, i):
                lat = lat0 + 1e-6 * carry  # data-dependent chain
                x_in = jnp.concatenate([lat] * 2)
                t_in = jnp.full((2 * B,), 500) + i
                eps = g.unet.apply({"params": gp["unet"]}, x_in, t_in, ctx)
                return jnp.sum(eps.astype(jnp.float32)), None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return s
        return run

    def make_sds(K):
        def run(gp, img0, ctx_cond, ctx_uncond):
            def body(carry, i):
                img = jnp.clip(img0 + 1e-6 * carry, 0, 1)
                k = jax.random.fold_in(jax.random.PRNGKey(7), i)
                loss = g.sds_loss(gp, k, ctx_cond, ctx_uncond, img,
                                  guidance_scale=100.0)
                return loss.astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return s
        return run

    def make_sds_grad(K):
        def run(gp, img0, ctx_cond, ctx_uncond):
            def one(img, i):
                k = jax.random.fold_in(jax.random.PRNGKey(7), i)
                return g.sds_loss(gp, k, ctx_cond, ctx_uncond, img,
                                  guidance_scale=100.0)
            def body(carry, i):
                img = jnp.clip(img0 + 1e-6 * carry, 0, 1)
                gr = jax.grad(one)(img, i)
                return jnp.sum(gr.astype(jnp.float32)), None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return s
        return run

    lat0 = jax.random.normal(key, (B, 64, 64, 4), jnp.bfloat16)
    img0 = jax.random.uniform(key, (B, H, W, 3))
    cond = jnp.tile(emb["default"], (B, 1, 1))
    uncond = jnp.tile(emb["uncond"], (B, 1, 1))

    results = {}
    for name, make, args in [
        ("S1_unet_fwd", make_unet, (gp, lat0, ctx0)),
        ("S2_sds_fwd", make_sds, (gp, img0, cond, uncond)),
        ("S3_sds_grad", make_sds_grad, (gp, img0, cond, uncond)),
    ]:
        t1 = scan_time(make, 1, *args)
        t9 = scan_time(make, 9, *args)
        per = (t9 - t1) / 8
        results[name] = (t1, t9, per)
        print(f"{name:14s} scan1={t1*1e3:8.1f}ms scan9={t9*1e3:8.1f}ms "
              f"per-iter={per*1e3:8.1f}ms", flush=True)

    print("\n==== per-iter (ms), dispatch-free ====")
    for k, (t1, t9, per) in results.items():
        print(f"{k:14s} {per*1e3:9.1f}")


if __name__ == "__main__":
    main()
