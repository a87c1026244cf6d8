"""2x2 isolation: VAE-encode grad under {emitter vs einsum-adjoint conv
backward} x {flax vs fused GroupNorm}.

gscan (old code: emitter bwd + flax GN) measured VG = 31.9 ms;
gscan2 (hybrid bwd + fused GN) measured VG = 51.2 ms — a regression.
This isolates which change is at fault.
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
    from dreamfusion_tpu.models import unet as unet_mod
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

    for emit_bwd in (True, False):
        for gn_fused in (False, True):
            conv_mod._EMITTER_BWD = emit_bwd
            unet_mod._GN_FUSED = gn_fused
            pvg = per_iter(make_vg, gp, big0)
            print(f"conv_bwd={'emitter' if emit_bwd else 'einsum-adj'} "
                  f"gn={'fused' if gn_fused else 'flax '}  "
                  f"VG={pvg*1e3:7.2f}ms", flush=True)


if __name__ == "__main__":
    main()
