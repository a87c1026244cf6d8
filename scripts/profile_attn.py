"""Attention microbench at SD-2.1 UNet self-attention shapes (scan-chained).

At 64^2 latents the level-0 self-attention is 4096 tokens x 5 heads x 64
head-dim (C=320) with CFG batch 2; XLA's unfused attention materializes
[B*h, 4096, 4096] logits in HBM. Candidates:
  V0 jax.nn.dot_product_attention (current, implementation default)
  V1 pallas TPU flash_attention
  V2 pure-XLA chunked online-softmax (scan over KV blocks)
  V3 naive einsum attention, softmax in bf16

Each timed as (scan9-scan1)/8 inside one jit; per-LAYER cost printed.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def scan_time(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        float(out)
    return (time.time() - t0) / reps


def chunked_attention(q, k, v, chunk=512):
    """q,k,v: [B, N, h, d] bf16. Online-softmax over KV chunks."""
    B, N, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    qt = (q * scale).transpose(0, 2, 1, 3)          # [B,h,N,d]
    kt = k.transpose(0, 2, 3, 1)                    # [B,h,d,N]
    vt = v.transpose(0, 2, 1, 3)                    # [B,h,N,d]
    nchunks = N // chunk
    kt_c = kt.reshape(B, h, d, nchunks, chunk).transpose(3, 0, 1, 2, 4)
    vt_c = vt.reshape(B, h, nchunks, chunk, d).transpose(2, 0, 1, 3, 4)

    def body(carry, kv):
        m, l, acc = carry
        kc, vc = kv                                  # [B,h,d,c], [B,h,c,d]
        s = jnp.einsum("bhnd,bhdc->bhnc", qt, kc,
                       preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhnc,bhcd->bhnd", p.astype(jnp.bfloat16), vc,
            preferred_element_type=jnp.float32)
        return (m_new, l, acc), None

    m0 = jnp.full((B, h, N, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, h, N, 1), jnp.float32)
    a0 = jnp.zeros((B, h, N, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0), (kt_c, vt_c))
    out = (acc / l).astype(q.dtype)                  # [B,h,N,d]
    return out.transpose(0, 2, 1, 3)                 # [B,N,h,d]


def naive_bf16(q, k, v):
    B, N, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v)


def main():
    shapes = [
        ("L0_4096tok_5h", 2, 4096, 5, 64),
        ("L1_1024tok_10h", 2, 1024, 10, 64),
        ("L2_256tok_20h", 2, 256, 20, 64),
    ]

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as pallas_flash)
        has_flash = True
    except Exception as e:
        print("no pallas flash:", e)
        has_flash = False

    for label, B, N, h, d in shapes:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, N, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, N, h, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, N, h, d),
                              jnp.bfloat16)

        def chain(attn_fn, K):
            @jax.jit
            def run(q, k, v):
                def body(carry, i):
                    qq = q + (1e-6 * carry).astype(q.dtype)
                    o = attn_fn(qq, k, v)
                    return jnp.sum(o.astype(jnp.float32)), None
                s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
                return s
            return run

        variants = {
            "V0_jnn": lambda q, k, v: jax.nn.dot_product_attention(q, k, v),
            "V2_chunked": functools.partial(
                chunked_attention, chunk=min(512, N)),
            "V3_naive_bf16": naive_bf16,
        }
        if has_flash:
            def flash(q, k, v):
                # pallas kernel wants [B, h, N, d]
                qt = q.transpose(0, 2, 1, 3)
                kt = k.transpose(0, 2, 1, 3)
                vt = v.transpose(0, 2, 1, 3)
                o = pallas_flash(qt, kt, vt, causal=False,
                                 sm_scale=1.0 / (d ** 0.5))
                return o.transpose(0, 2, 1, 3)
            variants["V1_flash"] = flash

        print(f"\n== {label}  B={B} N={N} h={h} d={d}")
        for name, fn in sorted(variants.items()):
            try:
                t1 = scan_time(chain(fn, 1), q, k, v)
                t9 = scan_time(chain(fn, 9), q, k, v)
                per = (t9 - t1) / 8
                print(f"  {name:14s} per-layer {per*1e3:8.2f} ms", flush=True)
            except Exception as e:
                print(f"  {name:14s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
