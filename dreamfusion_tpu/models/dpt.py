"""Vendored DPT monocular depth/normal network (Flax, TPU-native).

The reference vendors the full DPT architecture (dpt.py, 923 LoC of
torch+timm) so that `preprocess_image.py` can run the omnidata depth and
normal models self-contained (reference preprocess_image.py:59-100 loads
`DPTDepthModel(backbone='vitb_rn50_384')` from
`pretrained/omnidata/omnidata_dpt_{depth,normal}_v2.ckpt`).  This module
is the TPU-first equivalent: the exact same topology — hybrid
ResNet50-v2 + ViT-B/16 backbone, 'project' readout, 4-level reassemble,
RefineNet-style fusion decoder (reference dpt.py:357-520, 700-923) — as a
single jitted NHWC Flax apply.

TPU-first choices: NHWC layout, `ops/conv.MMConv` for every conv (384²
inputs ride the measured ≥256² XLA-emitter path; 1×1 convs are single
einsums), `ops/attention.attention` for the ViT blocks (577 tokens →
dense einsum path), `ops/resize.resize_bilinear` matmul interpolation for
the align_corners=True fusion upsamples (gather-free, CLAUDE.md gotcha 3).

Weight loading: `utils/convert.py --kind dpt` maps the torch checkpoint
onto this tree; `tests/fixtures/omnidata_dpt_keys.json` records the real
checkpoint's (key, shape) inventory (timm `vit_base_resnet50_384` naming,
reconstructed structurally — see scripts/gen_key_fixtures.py:gen_dpt).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.conv import MMConv, mm_conv
from ..ops.resize import resize_bilinear


@dataclass(frozen=True)
class DPTConfig:
    """vitb_rn50_384 + project readout (the only backbone the reference
    instantiates, preprocess_image.py:68-78; dpt.py:857-860 hooks)."""
    num_channels: int = 1               # 1 = depth, 3 = omnidata normals
    features: int = 256                 # decoder width (dpt.py:843)
    vit_dim: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    vit_mlp: int = 3072
    hooks: Tuple[int, int] = (8, 11)    # ViT blocks tapped for layers 3/4
    resnet_depths: Tuple[int, int, int] = (3, 4, 9)   # ResNetV2 stage blocks
    grid: int = 24                      # pos-embed grid side (384 / 16)
    non_negative: bool = True
    dtype: Any = jnp.float32

    @staticmethod
    def depth() -> "DPTConfig":
        return DPTConfig(num_channels=1)

    @staticmethod
    def normal() -> "DPTConfig":
        return DPTConfig(num_channels=3)


# ---------------------------------------------------------------------------
# hybrid backbone: ResNet50-v2 stem/stages (weight-standardized convs +
# GroupNorm32) feeding a ViT-B/16 token stack — timm vit_base_resnet50_384
# ---------------------------------------------------------------------------

class StdConv(nn.Module):
    """Weight-standardized conv (timm StdConv2dSame): kernel normalized
    per output channel before the conv — required to reproduce the
    ResNetV2 backbone's pretrained behavior exactly."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1], self.features))
        mu = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mu) * jax.lax.rsqrt(var + 1e-6)
        y = mm_conv(x, kernel.astype(x.dtype),
                    (self.strides, self.strides), "SAME")
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y.astype(x.dtype)


def _gn(name: str) -> nn.GroupNorm:
    """GroupNorm(32) in f32 (timm GroupNormAct minus the activation)."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class ResNetV2Bottleneck(nn.Module):
    """Non-preact bottleneck (timm ResNetV2 as used by the ViT hybrid):
    conv→norm→relu ×3 with a projection shortcut on the first block."""
    mid: int
    out: int
    stride: int = 1
    proj: bool = False

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        sc = x
        if self.proj:
            sc = StdConv(self.out, 1, self.stride, name="downsample_conv")(x)
            sc = _gn("downsample_norm")(sc).astype(dt)
        h = StdConv(self.mid, 1, name="conv1")(x)
        h = nn.relu(_gn("norm1")(h).astype(dt))
        h = StdConv(self.mid, 3, self.stride, name="conv2")(h)
        h = nn.relu(_gn("norm2")(h).astype(dt))
        h = StdConv(self.out, 1, name="conv3")(h)
        h = _gn("norm3")(h).astype(dt)
        return nn.relu(h + sc)


def _max_pool_same(x: jax.Array, window: int = 3, stride: int = 2
                   ) -> jax.Array:
    """MaxPool with TF-SAME padding (timm MaxPool2dSame)."""
    def pad(n):
        out = -(-n // stride)
        total = max((out - 1) * stride + window - n, 0)
        return (total // 2, total - total // 2)
    B, H, W, C = x.shape
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), ((0, 0), pad(H), pad(W), (0, 0)))


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp: int

    @nn.compact
    def __call__(self, x):                       # [B, N, D]
        B, N, D = x.shape
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm1")(x.astype(jnp.float32)).astype(x.dtype)
        qkv = nn.Dense(3 * D, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, N, 3 * self.heads,
                                        D // self.heads), 3, axis=2)
        a = attention(q, k, v).reshape(B, N, D)
        x = x + nn.Dense(D, name="proj")(a)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm2")(x.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(self.mlp, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(D, name="fc2")(h)


class HybridViT(nn.Module):
    """ResNetV2 (3, 4, 9) stages → 1×1 patch proj → ViT-B tokens; returns
    the four DPT tap activations (reference dpt.py:357-381 hook layout):
    stage0 [H/4, 256], stage1 [H/8, 512], and token sequences from ViT
    blocks `hooks[0]` and `hooks[1]` (residual-stream outputs, pre-norm)."""
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):                       # [B, H, W, 3]
        cfg = self.cfg
        B, H, W, _ = x.shape
        # --- ResNetV2 stem + stages ---
        h = StdConv(64, 7, 2, name="stem_conv")(x)
        h = nn.relu(_gn("stem_norm")(h).astype(x.dtype))
        h = _max_pool_same(h)                    # [H/4, 64]
        taps: List[jax.Array] = []
        chans = [(64, 256, 1), (128, 512, 2), (256, 1024, 2)]
        for s, depth in enumerate(cfg.resnet_depths):
            mid, out, stride = chans[s]
            for b in range(depth):
                h = ResNetV2Bottleneck(
                    mid, out, stride if b == 0 else 1, proj=(b == 0),
                    name=f"stage{s}_block{b}")(h)
            if s < 2:
                taps.append(h)                   # stage0 → 1/4, stage1 → 1/8
        # --- patchify + ViT ---
        gh, gw = H // 16, W // 16
        t = MMConv(cfg.vit_dim, 1, name="patch_proj")(h)     # [B,gh,gw,768]
        t = t.reshape(B, gh * gw, cfg.vit_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.vit_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.grid * cfg.grid + 1, cfg.vit_dim))
        # interpolate the grid part of the pos embed to (gh, gw)
        # (reference dpt.py:118-133 _resize_pos_embed, bilinear)
        pos_tok, pos_grid = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (cfg.grid, cfg.grid):
            pos_grid = resize_bilinear(
                pos_grid.reshape(1, cfg.grid, cfg.grid, cfg.vit_dim),
                (gh, gw), antialias=False   # F.interpolate semantics
                ).reshape(1, gh * gw, cfg.vit_dim)
        t = jnp.concatenate([jnp.tile(cls, (B, 1, 1)).astype(t.dtype), t],
                            axis=1)
        t = t + jnp.concatenate([pos_tok, pos_grid], axis=1).astype(t.dtype)
        for i in range(cfg.vit_depth):
            t = ViTBlock(cfg.vit_dim, cfg.vit_heads, cfg.vit_mlp,
                         name=f"block{i}")(t)
            if i in cfg.hooks:
                taps.append(t)
        # final LayerNorm exists in the checkpoint but its output is unused
        # by DPT (reference forward_vit taps block outputs only); applied
        # and discarded so the params exist for the converter — XLA DCEs it.
        nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(
            t.astype(jnp.float32))
        return taps


# ---------------------------------------------------------------------------
# decoder: readout-project reassemble + RefineNet fusion + task head
# ---------------------------------------------------------------------------

class ProjectReadout(nn.Module):
    """'project' readout (reference dpt.py:52-63): fold the cls token into
    every patch token via a Linear(2D→D)+GELU."""
    dim: int

    @nn.compact
    def __call__(self, t):                       # [B, 1+N, D]
        readout = jnp.broadcast_to(t[:, :1], t[:, 1:].shape)
        h = jnp.concatenate([t[:, 1:], readout], axis=-1)
        h = nn.Dense(self.dim, name="project")(h)
        return nn.gelu(h, approximate=False)


class ResidualConvUnit(nn.Module):
    """dpt.py:723-776 ResidualConvUnit_custom (bn=False path)."""
    features: int

    @nn.compact
    def __call__(self, x):
        h = MMConv(self.features, 3, name="conv1")(nn.relu(x))
        h = MMConv(self.features, 3, name="conv2")(nn.relu(h))
        return h + x


class FeatureFusionBlock(nn.Module):
    """dpt.py:780-827 FeatureFusionBlock_custom (bn=False, expand=False,
    align_corners=True)."""
    features: int

    @nn.compact
    def __call__(self, x, skip: Optional[jax.Array] = None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        B, H, W, C = x.shape
        x = resize_bilinear(x, (2 * H, 2 * W), align_corners=True)
        return MMConv(self.features, 1, name="out_conv")(x)


class DPTDepthModel(nn.Module):
    """Full DPT: returns [B, H, W, num_channels] (depth: 1, normals: 3)."""
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):                       # [B, H, W, 3], H,W % 32 == 0
        cfg = self.cfg
        F = cfg.features
        x = x.astype(cfg.dtype)
        l1, l2, t3, t4 = HybridViT(cfg, name="vit")(x)
        B, H, W, _ = x.shape
        gh, gw = H // 16, W // 16
        # reassemble layers 3/4 from tokens (dpt.py:447-479 act_postprocess)
        l3 = ProjectReadout(cfg.vit_dim, name="readout3")(t3)
        l3 = l3.reshape(B, gh, gw, cfg.vit_dim)
        l3 = MMConv(cfg.vit_dim, 1, name="post3_conv")(l3)          # 1/16
        l4 = ProjectReadout(cfg.vit_dim, name="readout4")(t4)
        l4 = l4.reshape(B, gh, gw, cfg.vit_dim)
        l4 = MMConv(cfg.vit_dim, 1, name="post4_conv")(l4)
        l4 = MMConv(cfg.vit_dim, 3, strides=2, name="post4_down")(l4)  # 1/32
        # scratch RN convs → common width (dpt.py:550-570)
        r1 = MMConv(F, 3, use_bias=False, name="layer1_rn")(l1)
        r2 = MMConv(F, 3, use_bias=False, name="layer2_rn")(l2)
        r3 = MMConv(F, 3, use_bias=False, name="layer3_rn")(l3)
        r4 = MMConv(F, 3, use_bias=False, name="layer4_rn")(l4)
        # RefineNet cascade (dpt.py:884-894)
        p4 = FeatureFusionBlock(F, name="refinenet4")(r4)
        p3 = FeatureFusionBlock(F, name="refinenet3")(p4, r3)
        p2 = FeatureFusionBlock(F, name="refinenet2")(p3, r2)
        p1 = FeatureFusionBlock(F, name="refinenet1")(p2, r1)
        # head (dpt.py:905-914)
        h = MMConv(F // 2, 3, name="head_conv1")(p1)
        h = resize_bilinear(h, (H, W), align_corners=True)
        h = nn.relu(MMConv(32, 3, name="head_conv2")(h))
        h = MMConv(cfg.num_channels, 1, name="head_conv3")(h)
        if cfg.non_negative:
            h = nn.relu(h)
        return h.astype(jnp.float32)


def init_dpt(cfg: DPTConfig, key: jax.Array, hw: int = 384):
    model = DPTDepthModel(cfg)
    params = model.init(key, jnp.zeros((1, hw, hw, 3), cfg.dtype))
    return model, params
