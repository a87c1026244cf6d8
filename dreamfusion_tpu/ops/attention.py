"""Memory-efficient (online-softmax) attention for the diffusion UNets.

Why: at 64^2 latents the SD UNet's level-0 self-attention runs over
N = 4096 tokens; an unfused softmax-attention materializes the
[B, heads, N, N] logits tensor in HBM (f32: ~640 MB per layer at CFG
batch 2), making the whole UNet forward HBM-bound.  The reference leans
on xformers' fused CUDA kernels for exactly this
(/root/reference/guidance/if_utils.py:36-37, ldm/modules/attention.py
memory-efficient path); on TPU we keep the logits in chunks that XLA can
hold in VMEM and rescale a running (max, sum, acc) triple — the standard
flash-attention recurrence, expressed as a `lax.scan` over KV blocks so
it stays pure XLA (no Pallas dependency; see scripts/profile_attn.py for
the measured comparison against `jax.nn.dot_product_attention` and the
Pallas TPU flash kernel on this backend).

All matmuls accumulate in f32 via `preferred_element_type`; the softmax
statistics are f32 regardless of the input dtype, so bf16 inputs lose no
more precision than the fused reference kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chunked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      chunk: int = 512, scale: float | None = None
                      ) -> jax.Array:
    """Online-softmax attention.  q: [B, N, h, d]; k/v: [B, M, h, d].

    Equivalent to `jax.nn.dot_product_attention(q, k, v)` but never
    materializes more than [B, h, N, chunk] logits at once.  M must be
    divisible by `chunk` (callers pad or pick chunk | M).
    """
    B, N, h, d = q.shape
    M = k.shape[1]
    if M % chunk:
        raise ValueError(f"KV length {M} not divisible by chunk {chunk}")
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    qt = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qt = qt.transpose(0, 2, 1, 3)                       # [B,h,N,d]
    kt = k.transpose(0, 2, 3, 1)                        # [B,h,d,M]
    vt = v.transpose(0, 2, 1, 3)                        # [B,h,M,d]
    nchunks = M // chunk
    kt_c = kt.reshape(B, h, d, nchunks, chunk).transpose(3, 0, 1, 2, 4)
    vt_c = vt.reshape(B, h, nchunks, chunk, d).transpose(2, 0, 1, 3, 4)

    def body(carry, kv):
        m, l, acc = carry
        kc, vc = kv                                     # [B,h,d,c], [B,h,c,d]
        s = jnp.einsum("bhnd,bhdc->bhnc", qt, kc,
                       preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhnc,bhcd->bhnd", p.astype(q.dtype), vc,
            preferred_element_type=jnp.float32)
        return (m_new, l, acc), None

    m0 = jnp.full((B, h, N, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, h, N, 1), jnp.float32)
    a0 = jnp.zeros((B, h, N, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0), (kt_c, vt_c))
    out = (acc / l).astype(q.dtype)                     # [B,h,N,d]
    return out.transpose(0, 2, 1, 3)                    # [B,N,h,d]


def dense_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float | None = None) -> jax.Array:
    """Unfused einsum attention, softmax statistics in f32.  Measured
    faster than `jax.nn.dot_product_attention` at the UNet's short/medium
    sequences on this backend (scripts/profile_attn.py: 0.47 vs 0.82 ms
    at N=1024) — the einsum contraction maps straight onto the MXU."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              logits_threshold: int = 64 * 1024 * 1024,
              chunk: int = 512) -> jax.Array:
    """Dispatch per measured winners (scripts/profile_attn.py,
    scripts/profile_attn_bwd.py on the attached TPU).  The criterion is
    the full logits tensor size B·h·N·M, not the sequence length:

      * UNet self-attention [2, 4096, 8, 40]: logits 268M elements —
        chunked online-softmax wins (0.48 ms vs 1.7-4.5 ms alternatives).
      * VAE mid-block [1, 4096, 1, 512]: logits only 16.8M — DENSE wins
        4-7x (fwd 0.06 vs 0.25 ms, fwd+bwd 0.18 vs 1.03 ms); the chunked
        scan's overhead dominates when the logits fit comfortably in HBM.
      * 77-token cross-attention: dense.

    Under an active tensor-parallel context (parallel/tp.set_tp) the head
    dimension is constrained to the model mesh axis, so each device
    computes its own heads shard-locally (Megatron attention)."""
    from ..parallel.tp import shard_heads
    q, k, v = shard_heads(q), shard_heads(k), shard_heads(v)
    B, N, h, _ = q.shape
    M = k.shape[1]
    if B * h * N * M > logits_threshold and M % chunk == 0:
        return chunked_attention(q, k, v, chunk=chunk)
    return dense_attention(q, k, v)
