"""Per-block UNet cost model (scan-chained): ResnetBlock / SpatialTransformer
at each SD-2.1 level's shape, CFG batch 2. Multiplicities (down+mid+up):
  L0 64^2x320 : 5 res, 5 attn     L1 32^2x640 : 5 res, 5 attn
  L2 16^2x1280: 5 res, 6 attn     L3 8^2x1280 : 5 res
Sum(block x multiplicity) ~ UNet forward; the residual vs the measured
whole-UNet time is glue (skip concats, up/downsamples, norms).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dreamfusion_tpu.models.unet import (ResnetBlock, SpatialTransformer)


def scan_time(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        float(out)
    return (time.time() - t0) / reps


def bench_module(label, mod, args_fn, K1=1, K2=9):
    key = jax.random.PRNGKey(0)
    args = args_fn(key)
    params = mod.init(key, *args)["params"]

    def chain(K):
        @jax.jit
        def run(params, *args):
            x0 = args[0]
            def body(carry, i):
                xx = x0 + (1e-6 * carry).astype(x0.dtype)
                y = mod.apply({"params": params}, xx, *args[1:])
                return jnp.sum(y.astype(jnp.float32)), None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return s
        return run

    t1 = scan_time(chain(K1), params, *args)
    t9 = scan_time(chain(K2), params, *args)
    per = (t9 - t1) / (K2 - K1)
    print(f"{label:24s} per-call {per*1e3:7.2f} ms", flush=True)
    return per


def main():
    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    B = 2
    ctx = jax.random.normal(jax.random.PRNGKey(9), (B, 77, 1024),
                            jnp.bfloat16)
    total = 0.0
    levels = [
        ("L0_64x320", 64, 320, 5, 5),
        ("L1_32x640", 32, 640, 5, 5),
        ("L2_16x1280", 16, 1280, 5, 6),
        ("L3_8x1280", 8, 1280, 5, 0),
    ]
    for label, hw, ch, n_res, n_attn in levels:
        def res_args(key, hw=hw, ch=ch):
            x = jax.random.normal(key, (B, hw, hw, ch), jnp.bfloat16)
            temb = jax.random.normal(key, (B, 1280), jnp.bfloat16)
            return (x, temb)
        t_res = bench_module(f"res_{label}", ResnetBlock(ch), res_args)
        total += n_res * t_res
        if n_attn:
            def attn_args(key, hw=hw, ch=ch):
                x = jax.random.normal(key, (B, hw, hw, ch), jnp.bfloat16)
                return (x, ctx)
            t_attn = bench_module(
                f"attn_{label}",
                SpatialTransformer(ch // 64, 64, 1), attn_args)
            total += n_attn * t_attn
    print(f"\nmodeled UNet forward ~ {total*1e3:.1f} ms (blocks only)")


if __name__ == "__main__":
    main()
