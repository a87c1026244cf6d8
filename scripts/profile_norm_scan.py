"""Scan-chained A/B: fp32 vs bf16 normalization stats in the guidance nets.

CLAUDE.md gotcha 7: only scan-chained timings are trustworthy.  Measures
S3 (grad of sds_loss wrt the image — exactly what the train step pays)
under three norm configurations:
  A baseline        GroupNorm + LayerNorm in fp32 (reference parity)
  B bf16 groupnorm  GroupNorm stats in bf16, LayerNorm fp32
  C bf16 both       GroupNorm + LayerNorm stats in bf16

Monkeypatches models.unet.GroupNorm32.__call__ / the LayerNorm factory so
the param tree is unchanged (same names/shapes, safe to reuse gp).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
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


def main():
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
    from dreamfusion_tpu.models import unet as unet_mod

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

    def make_sds_grad(K):
        def run(gp, img0, ctx_cond, ctx_uncond):
            def one(img, i):
                k = jax.random.fold_in(jax.random.PRNGKey(7), i)
                return g.sds_loss(gp, k, ctx_cond, ctx_uncond, img,
                                  guidance_scale=100.0)

            def body(carry, i):
                img = jnp.clip(img0 + 1e-6 * carry, 0, 1)
                loss, grad = jax.value_and_grad(one)(img, i)
                return loss.astype(jnp.float32) + jnp.sum(
                    grad.astype(jnp.float32)) * 1e-9, None

            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return s
        return run

    # sacrificial first program (gotcha 9)
    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3))
    args = (gp, img0, emb["default"], emb["uncond"])

    def set_variant(v):
        unet_mod._GN_DTYPE = (jnp.float32 if v == "A" else jnp.bfloat16)
        unet_mod._LN_DTYPE = (jnp.float32 if v in ("A", "B")
                              else jnp.bfloat16)

    results = {}
    for v, label in [("A", "fp32_norms"), ("B", "bf16_gn"),
                     ("C", "bf16_gn_ln")]:
        set_variant(v)
        t1 = scan_time(make_sds_grad, 1, *args)
        t9 = scan_time(make_sds_grad, 9, *args)
        per = (t9 - t1) / 8
        results[label] = per
        print(f"{v} {label:12s} scan1={t1*1e3:8.1f}ms scan9={t9*1e3:8.1f}ms "
              f"per-iter={per*1e3:8.1f}ms", flush=True)
    set_variant("A")

    print("\n==== per-iter (ms) ====")
    for k, val in results.items():
        print(f"{k:12s} {val*1e3:9.1f}")


if __name__ == "__main__":
    main()
