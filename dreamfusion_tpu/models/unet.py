"""Conditional diffusion UNet in Flax (NHWC, bf16-first).

One configurable architecture covers every diffusion prior the reference
uses (SURVEY.md §2.3 P3-P5):

  * Stable Diffusion 1.5  (ctx 768,  in 4,  heads fixed 8)
  * Stable Diffusion 2.x  (ctx 1024, in 4,  head_dim 64)
  * Zero-1-to-3           (ctx 768,  in 8 = 4 latent + 4 c_concat;
                           the ldm `UNetModel`, openaimodel.py:414, is this
                           same topology — hybrid conditioning enters as
                           channel concat + cross-attention)
  * DeepFloyd-IF stage-1  (pixel space, out 6 = eps + variance; see
                           guidance/deepfloyd.py for the channel split)

TPU-first choices: NHWC layout (XLA TPU's native conv layout), bf16
activations / fp32 params, `ops/attention.attention` (chunked
online-softmax vs dense dispatch, measured crossover) for attention,
GroupNorm in fp32 for stability.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn

from ..ops.attention import attention
from ..ops.conv import MMConv
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_levels: Tuple[bool, ...] = (True, True, True, False)
    context_dim: int = 768
    head_dim: Optional[int] = None      # if set, heads = channels // head_dim
    num_heads: int = 8                  # used when head_dim is None
    transformer_depth: int = 1
    dtype: Any = jnp.bfloat16

    @staticmethod
    def sd15() -> "UNetConfig":
        return UNetConfig()

    @staticmethod
    def sd21() -> "UNetConfig":
        return UNetConfig(context_dim=1024, head_dim=64)

    @staticmethod
    def zero123() -> "UNetConfig":
        return UNetConfig(in_channels=8)

    @staticmethod
    def if_stage1() -> "UNetConfig":
        # pixel-space, predicts (eps, variance) → 6 output channels
        return UNetConfig(in_channels=3, out_channels=6, model_channels=192,
                          channel_mult=(1, 2, 4, 8), context_dim=4096,
                          head_dim=64, attn_levels=(False, True, True, True))

    @staticmethod
    def tiny(context_dim: int = 32, in_channels: int = 4,
             out_channels: int = 4) -> "UNetConfig":
        """Small config for tests / CPU smoke runs."""
        return UNetConfig(in_channels=in_channels, out_channels=out_channels,
                          model_channels=32, channel_mult=(1, 2),
                          num_res_blocks=1, attn_levels=(False, True),
                          context_dim=context_dim, num_heads=2,
                          dtype=jnp.float32)


def timestep_embedding(t: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding, [cos|sin] flipped as in SD (diffusers
    flip_sin_to_cos=True, downscale_freq_shift=0). t: [B] → [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


# Norm stats dtypes — experiment knobs (scripts/profile_norm_scan.py);
# fp32 is the measured-safe default matching the reference stacks.
_LN_DTYPE = jnp.float32
_GN_DTYPE = jnp.float32
# True routes GroupNorm32 through the custom_vjp fused backward below;
# False through flax's nn.GroupNorm (autodiff) — A/B in
# scripts/profile_vae_matrix.py
_GN_FUSED = False


def group_norm_fused(x, scale, bias, num_groups: int, eps: float,
                     stats_dtype=jnp.float32):
    """GroupNorm with a hand-derived custom_vjp backward.

    XLA's autodiff of the fp32 stats chain lowers pathologically on this
    backend: a synthetic VAE-encoder conv stack costs 6.5 ms forward and
    ~0 extra backward, but +fp32 GroupNorm/SiLU glue adds ~44 ms of
    BACKWARD (scripts/profile_vae_bisect.py) — ~12x the tensor traffic
    the GN backward formula needs.  This implementation computes the
    standard closed-form backward (two group reductions + elementwise):
        dx = (1/sigma) * (dxh - mean_g(dxh) - xh * mean_g(dxh * xh))
    Forward numerics match flax nn.GroupNorm to float tolerance
    (oracle tests in tests/test_norm.py).
    Channels are grouped contiguously (flax/ldm convention); reductions
    run over (spatial..., channels-within-group) in `stats_dtype`.
    """
    orig_shape = x.shape
    C = orig_shape[-1]
    G = num_groups
    # on the (..., G, C//G)-reshaped array: reduce spatial dims + the
    # within-group axis, keep batch and group axes (flax semantics)
    red_axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)

    @jax.custom_vjp
    def f(x, scale, bias):
        xg = x.astype(stats_dtype).reshape(*orig_shape[:-1], G, C // G)
        mu = jnp.mean(xg, axis=red_axes, keepdims=True)
        var = jnp.mean(jnp.square(xg - mu), axis=red_axes, keepdims=True)
        xh = (xg - mu) * jax.lax.rsqrt(var + eps)
        y = xh.reshape(orig_shape) * scale.astype(stats_dtype) \
            + bias.astype(stats_dtype)
        return y

    def f_fwd(x, scale, bias):
        xg = x.astype(stats_dtype).reshape(*orig_shape[:-1], G, C // G)
        mu = jnp.mean(xg, axis=red_axes, keepdims=True)
        var = jnp.mean(jnp.square(xg - mu), axis=red_axes, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xh = (xg - mu) * rstd
        y = xh.reshape(orig_shape) * scale.astype(stats_dtype) \
            + bias.astype(stats_dtype)
        return y, (xh, rstd, scale)

    def f_bwd(res, dy):
        xh, rstd, scale = res
        dyf = dy.astype(stats_dtype)
        # affine grads (DCE'd when the params are frozen jit arguments)
        sum_axes = tuple(range(dy.ndim - 1))
        dbias = jnp.sum(dyf, axis=sum_axes)
        dscale = jnp.sum(dyf * xh.reshape(orig_shape), axis=sum_axes)
        dxh = (dyf * scale.astype(stats_dtype)).reshape(xh.shape)
        m1 = jnp.mean(dxh, axis=red_axes, keepdims=True)
        m2 = jnp.mean(dxh * xh, axis=red_axes, keepdims=True)
        dx = (rstd * (dxh - m1 - xh * m2)).reshape(orig_shape)
        return (dx.astype(x.dtype), dscale.astype(scale.dtype),
                dbias.astype(bias.dtype))

    f.defvjp(f_fwd, f_bwd)
    return f(x, scale, bias)


class _FusedGroupNorm(nn.Module):
    """nn.GroupNorm-compatible module (same param names/shapes) backed by
    group_norm_fused; instantiated with name='GroupNorm_0' so parameter
    trees and checkpoint converters are unchanged."""
    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return group_norm_fused(x, scale, bias, self.num_groups,
                                self.epsilon, stats_dtype=_GN_DTYPE)


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32 (matches the reference stacks).
    Falls back to fewer groups for tiny test channel counts.

    epsilon matters for weight parity (caught by tests/test_torch_oracles):
    the UNet ResBlock/out norms use torch's default 1e-5
    (openaimodel normalization()), while the VAE and SpatialTransformer
    norms use 1e-6 (ldm model.py:38 / attention.py:77 Normalize; diffusers
    matches both)."""
    dtype: Any = jnp.bfloat16
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        g = 32
        while x.shape[-1] % g:
            g //= 2
        if _GN_FUSED:
            y = _FusedGroupNorm(num_groups=g, epsilon=self.epsilon,
                                name="GroupNorm_0")(x)
        else:
            y = nn.GroupNorm(num_groups=g, epsilon=self.epsilon,
                             dtype=_GN_DTYPE)(x.astype(_GN_DTYPE))
        return y.astype(orig)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb):
        h = nn.silu(GroupNorm32(dtype=self.dtype)(x))
        h = MMConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.silu(GroupNorm32(dtype=self.dtype)(h))
        h = MMConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = MMConv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    num_heads: int
    head_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None):
        # x: [B, N, C]; context: [B, M, D] or None (self-attention)
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        B, N = x.shape[0], x.shape[1]
        M = context.shape[1]
        q = q.reshape(B, N, self.num_heads, self.head_dim)
        k = k.reshape(B, M, self.num_heads, self.head_dim)
        v = v.reshape(B, M, self.num_heads, self.head_dim)
        out = attention(q, k, v)
        out = out.reshape(B, N, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class TransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context):
        # torch nn.LayerNorm default eps (ldm attention.py / diffusers)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=_LN_DTYPE,
                                       name=name)
        x = x + CrossAttention(self.num_heads, self.head_dim,
                               dtype=self.dtype, name="attn1")(ln("norm1")(x).astype(self.dtype))
        x = x + CrossAttention(self.num_heads, self.head_dim,
                               dtype=self.dtype, name="attn2")(
            ln("norm2")(x).astype(self.dtype), context)
        h = ln("norm3")(x).astype(self.dtype)
        h = GEGLU(x.shape[-1] * 4, dtype=self.dtype, name="ff_geglu")(h)
        x = x + nn.Dense(x.shape[-1], dtype=self.dtype, name="ff_out")(h)
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm → 1x1 proj_in → transformer blocks → 1x1 proj_out + residual
    (ldm attention.py:221-266 / diffusers Transformer2DModel)."""
    num_heads: int
    head_dim: int
    depth: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        res = x
        h = GroupNorm32(dtype=self.dtype, epsilon=1e-6)(x)
        h = MMConv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        for i in range(self.depth):
            h = TransformerBlock(self.num_heads, self.head_dim,
                                 dtype=self.dtype, name=f"block_{i}")(h, context)
        h = h.reshape(B, H, W, C)
        h = MMConv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + res


class UNet2DCondition(nn.Module):
    cfg: UNetConfig

    def _heads(self, channels: int) -> Tuple[int, int]:
        if self.cfg.head_dim is not None:
            return channels // self.cfg.head_dim, self.cfg.head_dim
        return self.cfg.num_heads, channels // self.cfg.num_heads

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array,
                 context: jax.Array) -> jax.Array:
        """x: [B, H, W, in_ch]; t: [B] int/float; context: [B, M, ctx_dim]."""
        cfg = self.cfg
        dt = cfg.dtype
        ch0 = cfg.model_channels

        temb = timestep_embedding(t, ch0)
        temb = nn.Dense(ch0 * 4, dtype=dt, name="time_dense_0")(temb.astype(dt))
        temb = nn.Dense(ch0 * 4, dtype=dt, name="time_dense_1")(nn.silu(temb))
        context = context.astype(dt)

        h = MMConv(ch0, (3, 3), padding=1, dtype=dt, name="conv_in")(
            x.astype(dt))
        skips = [h]

        # down
        for lvl, mult in enumerate(cfg.channel_mult):
            ch = ch0 * mult
            for blk in range(cfg.num_res_blocks):
                h = ResnetBlock(ch, dtype=dt, name=f"down_{lvl}_res_{blk}")(h, temb)
                if cfg.attn_levels[lvl]:
                    nh, hd = self._heads(ch)
                    h = SpatialTransformer(
                        nh, hd, cfg.transformer_depth, dtype=dt,
                        name=f"down_{lvl}_attn_{blk}")(h, context)
                skips.append(h)
            if lvl != len(cfg.channel_mult) - 1:
                h = MMConv(ch, (3, 3), strides=2, padding=1, dtype=dt,
                            name=f"down_{lvl}_downsample")(h)
                skips.append(h)

        # mid
        ch = ch0 * cfg.channel_mult[-1]
        nh, hd = self._heads(ch)
        h = ResnetBlock(ch, dtype=dt, name="mid_res_0")(h, temb)
        h = SpatialTransformer(nh, hd, cfg.transformer_depth, dtype=dt,
                               name="mid_attn")(h, context)
        h = ResnetBlock(ch, dtype=dt, name="mid_res_1")(h, temb)

        # up
        for lvl in reversed(range(len(cfg.channel_mult))):
            ch = ch0 * cfg.channel_mult[lvl]
            for blk in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock(ch, dtype=dt, name=f"up_{lvl}_res_{blk}")(h, temb)
                if cfg.attn_levels[lvl]:
                    nh, hd = self._heads(ch)
                    h = SpatialTransformer(
                        nh, hd, cfg.transformer_depth, dtype=dt,
                        name=f"up_{lvl}_attn_{blk}")(h, context)
            if lvl != 0:
                B, H, W, C = h.shape
                # exact 2x nearest upsample as broadcast+reshape —
                # jax.image.resize can lower to per-row gathers on this
                # backend (rows are the cost, CLAUDE.md gotcha 3)
                h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                     (B, H, 2, W, 2, C))
                h = h.reshape(B, H * 2, W * 2, C)
                h = MMConv(ch, (3, 3), padding=1, dtype=dt,
                            name=f"up_{lvl}_upsample")(h)

        h = nn.silu(GroupNorm32(dtype=dt)(h))
        h = MMConv(cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(h.astype(jnp.float32))
        return h
