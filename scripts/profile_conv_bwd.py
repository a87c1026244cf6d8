"""Single-conv backward microbench (scan-chained): is the emitter's
transposed conv the VAE-backward bottleneck, and does expressing dx as a
plain FORWARD conv of the cotangent (flipped kernel) fix it?

Cases at 512^2 x 128ch bf16 (the VAE-encoder hot shape):
  F    forward conv (emitter)
  G    d/dx via autodiff (emitter transpose)
  FLIP dx computed directly: conv(g, flip(k).T), stride 1, SAME-adjusted
  G2   stride-2 downsample conv: d/dx via autodiff
  FLIP2 stride-2 dx via phase trick: s2d(g up) ... (not impl; emitter only)
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


DIMS = ("NHWC", "HWIO", "NHWC")


def main():
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    H = 512
    C = 128
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, H, H, C), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, C),
                          jnp.bfloat16) * 0.05

    def conv(x, kk, s=1, pad=((1, 1), (1, 1))):
        return jax.lax.conv_general_dilated(x, kk, (s, s), pad,
                                            dimension_numbers=DIMS)

    def chain(body):
        def make(K):
            def run(x0, k):
                def b(carry, i):
                    return body(x0 + carry.astype(jnp.bfloat16) * 1e-6,
                                k), None
                s, _ = jax.lax.scan(b, jnp.float32(0), jnp.arange(K))
                return s
            return run
        return make

    def f_body(x, k):
        return jnp.sum(conv(x, k).astype(jnp.float32)) * 1e-9

    def g_body(x, k):
        # squared output: a linear loss's input-grad is x-independent and
        # XLA hoists it out of the scan (loop-invariant) — square keeps
        # the transpose conv inside the loop
        gr = jax.grad(lambda xx: jnp.sum(
            conv(xx, k).astype(jnp.float32) ** 2))(x)
        return jnp.sum(gr.astype(jnp.float32)) * 1e-9

    kT = k[::-1, ::-1].transpose(0, 1, 3, 2)

    def flip_body(x, k):
        # pretend x is the cotangent g; dx = conv(g, flip(k)^T)
        dx = conv(x, kT)
        return jnp.sum(dx.astype(jnp.float32)) * 1e-9

    def g2_body(x, k):
        gr = jax.grad(lambda xx: jnp.sum(
            conv(xx, k, s=2,
                 pad=((0, 1), (0, 1))).astype(jnp.float32) ** 2))(x)
        return jnp.sum(gr.astype(jnp.float32)) * 1e-9

    # dkernel (the other transpose the emitter must emit in general)
    def dk_body(x, k):
        gr = jax.grad(lambda kk: jnp.sum(
            conv(x, kk).astype(jnp.float32)))(k)
        return jnp.sum(gr.astype(jnp.float32)) * 1e-9

    for name, body in [("F    fwd 3x3 s1", f_body),
                       ("G    dx autodiff s1", g_body),
                       ("FLIP dx as fwd conv", flip_body),
                       ("G2   dx autodiff s2", g2_body),
                       ("DK   dkernel autodiff", dk_body)]:
        p = per_iter(chain(body), x0, k)
        print(f"{name:22s} per-iter={p*1e3:7.2f}ms", flush=True)


if __name__ == "__main__":
    main()
