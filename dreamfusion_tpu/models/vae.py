"""AutoencoderKL (the SD VAE) in Flax, NHWC.

TPU-native equivalent of /root/reference/ldm/models/autoencoder.py:285-342
(+ the diffusers VAE used by guidance/sd_utils.py).  The zero123 VAE is
architecture-identical (SURVEY.md Appendix A), so this module hosts both
weight sets.  Crucially, `encode` is differentiable — SDS backprops through
the VAE encoder (the reference comments "wasted two hours" on exactly this,
ddpm.py:822-823).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Tuple

import flax.linen as nn

from ..ops.attention import attention
from ..ops.conv import MMConv
import jax
import jax.numpy as jnp

from .unet import GroupNorm32


@dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    scale_factor: float = 0.18215
    dtype: Any = jnp.bfloat16

    @staticmethod
    def sd() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                         dtype=jnp.float32)

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


class VAEResnet(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.silu(GroupNorm32(epsilon=1e-6, dtype=self.dtype)(x))
        h = MMConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.silu(GroupNorm32(epsilon=1e-6, dtype=self.dtype)(h))
        h = MMConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = MMConv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class VAEAttn(nn.Module):
    """Single-head spatial self-attention (ldm diffusionmodules/model.py)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(epsilon=1e-6, dtype=self.dtype)(x)
        q = MMConv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, H * W, 1, C)
        k = MMConv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, H * W, 1, C)
        v = MMConv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, H * W, 1, C)
        o = attention(q, k, v).reshape(B, H, W, C)
        return x + MMConv(C, (1, 1), dtype=self.dtype, name="proj_out")(o)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.dtype
        h = MMConv(cfg.ch, (3, 3), padding=1, dtype=dt, name="conv_in")(
            x.astype(dt))
        for lvl, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for b in range(cfg.num_res_blocks):
                h = VAEResnet(ch, dtype=dt, name=f"down_{lvl}_res_{b}")(h)
            if lvl != len(cfg.ch_mult) - 1:
                # asymmetric pad (0,1) then stride-2 conv (ldm Downsample)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = MMConv(ch, (3, 3), strides=2, padding="VALID", dtype=dt,
                            name=f"down_{lvl}_downsample")(h)
        ch = cfg.ch * cfg.ch_mult[-1]
        h = VAEResnet(ch, dtype=dt, name="mid_res_0")(h)
        h = VAEAttn(dtype=dt, name="mid_attn")(h)
        h = VAEResnet(ch, dtype=dt, name="mid_res_1")(h)
        h = nn.silu(GroupNorm32(epsilon=1e-6, dtype=dt)(h))
        h = MMConv(2 * cfg.z_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(h.astype(jnp.float32))
        return MMConv(2 * cfg.z_channels, (1, 1), dtype=jnp.float32,
                       name="quant_conv")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dt = cfg.dtype
        z = MMConv(cfg.z_channels, (1, 1), dtype=jnp.float32,
                    name="post_quant_conv")(z.astype(jnp.float32))
        ch = cfg.ch * cfg.ch_mult[-1]
        h = MMConv(ch, (3, 3), padding=1, dtype=dt, name="conv_in")(
            z.astype(dt))
        h = VAEResnet(ch, dtype=dt, name="mid_res_0")(h)
        h = VAEAttn(dtype=dt, name="mid_attn")(h)
        h = VAEResnet(ch, dtype=dt, name="mid_res_1")(h)
        for lvl in reversed(range(len(cfg.ch_mult))):
            ch = cfg.ch * cfg.ch_mult[lvl]
            for b in range(cfg.num_res_blocks + 1):
                h = VAEResnet(ch, dtype=dt, name=f"up_{lvl}_res_{b}")(h)
            if lvl != 0:
                B, H, W, C = h.shape
                # gather-free 2x nearest upsample (see unet.py note)
                h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                     (B, H, 2, W, 2, C))
                h = h.reshape(B, H * 2, W * 2, C)
                h = MMConv(ch, (3, 3), padding=1, dtype=dt,
                            name=f"up_{lvl}_upsample")(h)
        h = nn.silu(GroupNorm32(epsilon=1e-6, dtype=dt)(h))
        return MMConv(3, (3, 3), padding=1, dtype=jnp.float32,
                       name="conv_out")(h.astype(jnp.float32))


class GaussianMoments(NamedTuple):
    mean: jax.Array
    logvar: jax.Array

    def sample(self, key: jax.Array) -> jax.Array:
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(key, self.mean.shape)

    def mode(self) -> jax.Array:
        return self.mean


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")

    def encode(self, x: jax.Array) -> GaussianMoments:
        """x: [B, H, W, 3] in [-1, 1] → moments over [B, H/8, W/8, z]."""
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return GaussianMoments(mean, logvar)

    def decode(self, z: jax.Array) -> jax.Array:
        """z: *scaled* latents → [B, H, W, 3] in [-1, 1]."""
        return self.decoder(z / self.cfg.scale_factor)

    def __call__(self, x, key):
        m = self.encode(x)
        z = m.sample(key) * self.cfg.scale_factor
        return self.decode(z)
