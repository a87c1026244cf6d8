"""Scan-chained A/B of the VAE-encoder *backward* conv path.

profile_guidance_scan.py found VAE encode fwd = 8.3 ms but fwd+bwd(image)
= 31.9 ms — backward ~24 ms for what should be ~1x forward FLOPs (frozen
params: only input-grads are needed).  Suspect: the >=256^2 dispatch to
XLA's conv emitter was crossover-measured FORWARD-only at 512^2
(scripts/profile_conv2.py); its transpose/grad convs (incl. stride-2
input-dilated transposed convs) were never measured.

Variants (monkeypatching ops.conv._LAX_CONV_MIN_PIXELS, read at trace
time):
  A 256^2 threshold (current default)
  B einsum everywhere (threshold inf)
  C emitter everywhere (threshold 0)
Each timed scan-chained for V (encode fwd) and VG (encode fwd+bwd).
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
    from dreamfusion_tpu.ops import conv as conv_mod

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

    def make_v(K):
        def run(gp, big0):
            def body(carry, i):
                img = jnp.clip(big0 + 1e-6 * carry, 0, 1)
                lat = g.encode_imgs(gp, jax.random.fold_in(
                    jax.random.PRNGKey(5), i), img)
                return jnp.sum(lat.astype(jnp.float32)) * 1e-9, None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return s
        return run

    def make_vg(K):
        def run(gp, big0):
            def body(carry, i):
                img = jnp.clip(big0 + 1e-6 * carry, 0, 1)

                def f(im):
                    lat = g.encode_imgs(gp, jax.random.fold_in(
                        jax.random.PRNGKey(5), i), im)
                    return jnp.sum(lat.astype(jnp.float32))
                val, grad = jax.value_and_grad(f)(img)
                return val * 1e-9 + jnp.sum(
                    grad.astype(jnp.float32)) * 1e-9, None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return s
        return run

    for label, thresh in [("A 256^2 (default)", 256 * 256),
                          ("B einsum everywhere", 1 << 62),
                          ("C emitter everywhere", 0)]:
        conv_mod._LAX_CONV_MIN_PIXELS = thresh
        pv = per_iter(make_v, gp, big0)
        pvg = per_iter(make_vg, gp, big0)
        print(f"{label:22s} V fwd={pv*1e3:7.2f}ms  VG fwd+bwd={pvg*1e3:7.2f}ms"
              f"  (bwd ~{(pvg-pv)*1e3:6.2f}ms)", flush=True)
    conv_mod._LAX_CONV_MIN_PIXELS = 256 * 256


if __name__ == "__main__":
    main()
