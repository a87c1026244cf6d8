"""Attention backward at the VAE mid-block shape (N=4096, 1 head, d=512):
chunked online-softmax vs dense — fwd and fwd+bwd, scan-chained.

Hunting the ~12 ms of VAE-encoder backward that per-conv transposes and
GroupNorm don't explain (profile_conv_bwd.py, profile_vae_matrix.py).
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
    from dreamfusion_tpu.ops.attention import chunked_attention, dense_attention

    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    B, N, h, d = 1, 4096, 1, 512
    key = jax.random.PRNGKey(0)
    q0 = jax.random.normal(key, (B, N, h, d), jnp.bfloat16)
    k0 = jax.random.normal(jax.random.fold_in(key, 1), (B, N, h, d),
                           jnp.bfloat16)
    v0 = jax.random.normal(jax.random.fold_in(key, 2), (B, N, h, d),
                           jnp.bfloat16)

    def chain(body):
        def make(K):
            def run(q0, k0, v0):
                def b(carry, i):
                    q = q0 + carry.astype(jnp.bfloat16) * 1e-6
                    return body(q, k0, v0), None
                s, _ = jax.lax.scan(b, jnp.float32(0), jnp.arange(K))
                return s
            return run
        return make

    def fwd_body(fn):
        def body(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32)) * 1e-9
        return body

    def grad_body(fn):
        def body(q, k, v):
            def f(q):
                return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
            g = jax.grad(f)(q)
            return jnp.sum(g.astype(jnp.float32)) * 1e-9
        return body

    for name, fn in [("chunked", chunked_attention),
                     ("dense  ", dense_attention)]:
        pf = per_iter(chain(fwd_body(fn)), q0, k0, v0)
        pg = per_iter(chain(grad_body(fn)), q0, k0, v0)
        print(f"{name} fwd={pf*1e3:7.2f}ms fwd+bwd={pg*1e3:7.2f}ms "
              f"(bwd ~{(pg-pf)*1e3:6.2f}ms)", flush=True)


if __name__ == "__main__":
    main()
