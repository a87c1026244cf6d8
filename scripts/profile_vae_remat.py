"""Scan-chained A/B: does remat (jax.checkpoint) or a bf16 input image
shave the VAE-encoder backward's ~12 ms whole-graph overhead?

CLAUDE.md gotcha 13: VG (encode fwd+bwd) ≈ 32 ms for fwd 8.5, and the
per-op bisects (convs, GroupNorm, attention) only account for ~20 ms of
the backward.  Hypotheses:
  B full-encoder remat — backward recomputes the forward, which changes
    XLA's scheduling/liveness; if the overhead is spill/copy pressure
    from saved activations, this wins despite the extra forward FLOPs.
  C bf16 image into encode (the resize output is f32 today) — halves
    HBM traffic on every 512² activation the backward re-reads.
  D both.
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
    return (t9 - t1) / 8


def main():
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance

    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    g = StableDiffusionGuidance(SDConfig(sd_version="2.1"))
    key = jax.random.PRNGKey(0)
    gp = g.init_params(key)
    gp = {"vae": jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                              if x.dtype == jnp.float32 else x, gp["vae"])}
    gp = jax.device_put(gp)
    jax.block_until_ready(gp)
    B = 1
    IS = g.cfg.image_size

    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    big0 = jax.random.uniform(jax.random.PRNGKey(2), (B, IS, IS, 3))

    def make_vg(remat, cast_bf16):
        def make(K):
            def run(gp, big0):
                def body(carry, i):
                    img = jnp.clip(big0 + 1e-6 * carry, 0, 1)

                    def f(im):
                        if cast_bf16:
                            im = im.astype(jnp.bfloat16)
                        enc = lambda x: g.encode_imgs(
                            gp, jax.random.fold_in(jax.random.PRNGKey(5), i),
                            x)
                        if remat:
                            enc = jax.checkpoint(enc)
                        return jnp.sum(enc(im).astype(jnp.float32))
                    val, grad = jax.value_and_grad(f)(img)
                    return val * 1e-9 + jnp.sum(
                        grad.astype(jnp.float32)) * 1e-9, None
                s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
                return s
            return run
        return make

    for label, remat, cast in [("A baseline        ", False, False),
                               ("B remat           ", True, False),
                               ("C bf16 image      ", False, True),
                               ("D remat + bf16    ", True, True)]:
        p = per_iter(make_vg(remat, cast), gp, big0)
        print(f"{label} VG fwd+bwd = {p*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
