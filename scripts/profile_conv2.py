"""Tighter re-measure of 3x3-conv strategies at VAE shapes (K=3 vs K=19
chained scans, per-iter over 16) — the first pass was too noisy to set the
mm_conv im2col threshold.  Also measures the conv BACKWARD (what the SDS
step pays through the VAE encoder)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dreamfusion_tpu.ops.conv import mm_conv


def scan_time(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        float(out)
    return (time.time() - t0) / reps


def im2col_conv(x, kernel):
    B, H, W, C = x.shape
    kh, kw, _, O = kernel.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, i:i + H, j:j + W, :] for i in range(3) for j in range(3)]
    xcol = jnp.concatenate(cols, axis=-1)
    wr = kernel.reshape(9 * C, O)
    return jnp.einsum("bhwc,co->bhwo", xcol, wr,
                      preferred_element_type=jnp.float32)


def lax_conv(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    shapes = [
        ("vae_512", 1, 512, 512, 128, 128),
        ("vae_256", 1, 256, 256, 256, 256),
        ("vae_128", 1, 128, 128, 512, 512),
    ]
    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    for label, B, H, W, C, O in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, O),
                              jnp.bfloat16)
        gflop = 2 * B * H * W * C * O * 9 / 1e9

        def chain_fwd(conv_fn, K):
            @jax.jit
            def run(x, k):
                def body(carry, i):
                    xx = x + (1e-6 * carry).astype(x.dtype)
                    y = conv_fn(xx, k)
                    return jnp.sum(y.astype(jnp.float32)), None
                s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
                return s
            return run

        def chain_bwd(conv_fn, K):
            @jax.jit
            def run(x, k):
                def one(xx, kk):
                    return jnp.sum(conv_fn(xx, kk).astype(jnp.float32) ** 2)
                def body(carry, i):
                    xx = x + (1e-6 * carry).astype(x.dtype)
                    gx, gk = jax.grad(one, argnums=(0, 1))(xx, k)
                    return (jnp.sum(gx.astype(jnp.float32)) +
                            jnp.sum(gk.astype(jnp.float32))), None
                s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
                return s
            return run

        print(f"\n== {label} [{B},{H},{W},{C}]->{O}  ({gflop:.1f} GFLOP fwd)")
        for name, fn in [("C0_mmconv", mm_conv), ("C1_im2col", im2col_conv),
                         ("C2_laxconv", lax_conv)]:
            for mode, chain in [("fwd", chain_fwd), ("f+b", chain_bwd)]:
                try:
                    t3 = scan_time(chain(fn, 3), x, k)
                    t19 = scan_time(chain(fn, 19), x, k)
                    per = (t19 - t3) / 16
                    print(f"  {name:12s} {mode} per-call {per*1e3:8.2f} ms "
                          f"({gflop/max(per,1e-9)/1e3:6.1f} TFLOP/s-fwd-equiv)",
                          flush=True)
                except Exception as e:
                    print(f"  {name:12s} {mode} FAILED {type(e).__name__}: {e}",
                          flush=True)


if __name__ == "__main__":
    main()
