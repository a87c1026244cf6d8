"""T5 encoder (v1.1 topology) in Flax — DeepFloyd-IF's text encoder.

The reference consumes T5-XXL through `IFPipeline.from_pretrained`
(/root/reference/guidance/if_utils.py:35-48: `pipe.text_encoder`), i.e.
transformers' `T5EncoderModel`.  This is a from-scratch Flax encoder with
the same math so the published `text_encoder/` weights convert directly
(utils/convert.py t5_mapper):

  * RMSNorm (no bias, no mean subtraction), pre-norm residual blocks
  * relative position bias: bucketed (32 buckets, max distance 128),
    learned per head, added to attention logits; the embedding lives in
    layer 0 and is shared by all layers (transformers keeps the parameter
    only under `encoder.block.0`)
  * gated-GELU feed-forward (wi_0 ⊙ gelu, wi_1 linear, wo out) — the
    v1.1 "gated-gelu" variant IF uses
  * no biases anywhere; final RMSNorm after the stack
  * t5-v1_1-xxl dims: d_model 4096, 24 layers, 64 heads × d_kv 64,
    d_ff 10240, vocab 32128

Runs once per prompt at 77 tokens — a host-side prep step, so plain dense
attention is the right call (no chunking / flash machinery needed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @staticmethod
    def xxl() -> "T5Config":
        return T5Config()

    @staticmethod
    def tiny() -> "T5Config":
        return T5Config(vocab_size=256, d_model=32, d_kv=8, d_ff=64,
                        num_layers=2, num_heads=4)


class RMSNorm(nn.Module):
    """T5 layer norm: x / rms(x) * weight, computed in fp32."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        return (w * (x32 * jax.lax.rsqrt(var + self.epsilon))).astype(orig)


def relative_position_buckets(qlen: int, klen: int, num_buckets: int,
                              max_distance: int) -> jnp.ndarray:
    """Bidirectional T5 bucketing of (key_pos - query_pos) → [qlen, klen]
    int32 bucket ids (transformers T5Attention._relative_position_bucket)."""
    ctx = jnp.arange(qlen)[:, None]
    mem = jnp.arange(klen)[None, :]
    rel = mem - ctx                                   # key - query
    nb = num_buckets // 2
    buckets = jnp.where(rel > 0, nb, 0)
    n = jnp.abs(rel)
    max_exact = nb // 2
    is_small = n < max_exact
    # logarithmic buckets for larger distances
    large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return buckets + jnp.where(is_small, n, large)


class T5SelfAttention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, position_bias):
        """x [B,L,D]; mask [B,L] (1=keep); position_bias [H,L,L] or None.
        Returns (out, position_bias) — layer 0 creates the bias, later
        layers reuse it (T5 shares one embedding across the stack)."""
        c = self.cfg
        inner = c.num_heads * c.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=c.dtype,
                                      name=name)
        B, L, _ = x.shape
        q = dense("q")(x).reshape(B, L, c.num_heads, c.d_kv)
        k = dense("k")(x).reshape(B, L, c.num_heads, c.d_kv)
        v = dense("v")(x).reshape(B, L, c.num_heads, c.d_kv)

        if self.has_relative_bias:
            rel_emb = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0 / (c.d_model ** 0.5)),
                (c.relative_attention_num_buckets, c.num_heads))
            buckets = relative_position_buckets(
                L, L, c.relative_attention_num_buckets,
                c.relative_attention_max_distance)
            position_bias = jnp.transpose(rel_emb[buckets], (2, 0, 1))

        # T5 does NOT scale by 1/sqrt(d_kv) (folded into init)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        if position_bias is not None:
            logits = logits + position_bias[None].astype(jnp.float32)
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, None, None, :] > 0, logits, neg)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, L, inner)
        return nn.Dense(c.d_model, use_bias=False, dtype=c.dtype,
                        name="o")(o), position_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, position_bias):
        c = self.cfg
        h = RMSNorm(c.layer_norm_epsilon, name="ln_attn")(x)
        a, position_bias = T5SelfAttention(
            c, self.has_relative_bias, name="attn")(h, mask, position_bias)
        x = x + a
        h = RMSNorm(c.layer_norm_epsilon, name="ln_ff")(x)
        g = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi_0")(h)
        u = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi_1")(h)
        h = nn.gelu(g, approximate=True) * u
        x = x + nn.Dense(c.d_model, use_bias=False, dtype=c.dtype,
                         name="wo")(h)
        return x, position_bias


class T5Encoder(nn.Module):
    """token ids [B,L] + mask [B,L] → last hidden state [B,L,d_model]."""
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: jax.Array | None = None) -> jax.Array:
        c = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        emb = nn.Embed(c.vocab_size, c.d_model, name="shared")(input_ids)
        x = emb.astype(c.dtype)
        bias = None
        for i in range(c.num_layers):
            x, bias = T5Block(c, has_relative_bias=(i == 0),
                              name=f"block_{i}")(x, attention_mask, bias)
        return RMSNorm(c.layer_norm_epsilon, name="final_ln")(x)
