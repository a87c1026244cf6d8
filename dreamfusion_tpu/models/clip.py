"""CLIP text + vision encoders in Flax.

Covers three reference uses:
  * SD prompt embedding (guidance/sd_utils.py:76-83 — CLIP text encoder
    last_hidden_state),
  * CLIP guidance loss (guidance/clip_utils.py — normalized image/text
    embeds, needs *gradients through the vision tower*, so it must be JAX),
  * zero123's FrozenCLIPImageEmbedder (ldm/modules/encoders/modules.py:343 —
    ViT-L/14 image embed, used one-time per reference image).

Tokenization is a one-time host-side step (see guidance/tokenizer.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn

from ..ops.conv import MMConv
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_len: int = 77
    use_quick_gelu: bool = True     # CLIP ViT-L (SD1.5); OpenCLIP (SD2) uses gelu
    dtype: Any = jnp.bfloat16

    @staticmethod
    def sd15() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def sd21() -> "CLIPTextConfig":
        return CLIPTextConfig(hidden_size=1024, num_layers=23, num_heads=16,
                              use_quick_gelu=False)

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(vocab_size=256, hidden_size=32, num_layers=2,
                              num_heads=2, max_len=16, dtype=jnp.float32)


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    projection_dim: int = 768
    use_quick_gelu: bool = True
    dtype: Any = jnp.bfloat16

    @staticmethod
    def vit_l14() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def vit_b16() -> "CLIPVisionConfig":
        return CLIPVisionConfig(patch_size=16, hidden_size=768, num_layers=12,
                                num_heads=12, projection_dim=512)

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                                num_layers=2, num_heads=2, projection_dim=16,
                                dtype=jnp.float32)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPLayer(nn.Module):
    hidden: int
    heads: int
    quick_gelu: bool
    dtype: Any

    @nn.compact
    def __call__(self, x, causal_mask: Optional[jax.Array]):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x).astype(self.dtype)
        B, N, C = h.shape
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q")(h)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k")(h)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v")(h)
        q = q.reshape(B, N, self.heads, hd)
        k = k.reshape(B, N, self.heads, hd)
        v = v.reshape(B, N, self.heads, hd)
        o = jax.nn.dot_product_attention(
            q, k, v, is_causal=causal_mask is not None)
        o = nn.Dense(self.hidden, dtype=self.dtype, name="attn_out")(
            o.reshape(B, N, C))
        x = x + o
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x).astype(self.dtype)
        h = nn.Dense(self.hidden * 4, dtype=self.dtype, name="fc1")(h)
        h = _quick_gelu(h) if self.quick_gelu else nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """input_ids: [B, L] int32 → last_hidden_state [B, L, hidden]."""
        cfg = self.cfg
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embedding",
                       dtype=cfg.dtype)(input_ids)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (cfg.max_len, cfg.hidden_size))
        x = tok + pos[None, :input_ids.shape[1]].astype(cfg.dtype)
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg.hidden_size, cfg.num_heads, cfg.use_quick_gelu,
                          cfg.dtype, name=f"layer_{i}")(x, causal_mask=True)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_ln")(x)
        return x

    def pooled(self, input_ids: jax.Array, eos_token_id: int = 49407):
        h = self(input_ids)
        eos_idx = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32),
                             axis=-1)
        return h[jnp.arange(h.shape[0]), eos_idx]


class CLIPVisionEncoder(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """pixels: [B, H, W, 3] normalized → (pooled_proj [B, proj],
        last_hidden [B, 1+P, hidden])."""
        cfg = self.cfg
        B = pixels.shape[0]
        patches = MMConv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
                          strides=cfg.patch_size, use_bias=False,
                          dtype=cfg.dtype, name="patch_embed")(
            pixels.astype(cfg.dtype))
        patches = patches.reshape(B, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype), (B, 1, cfg.hidden_size)),
             patches], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n_pos, cfg.hidden_size))
        x = x + pos[None].astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_ln")(x).astype(cfg.dtype)
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg.hidden_size, cfg.num_heads, cfg.use_quick_gelu,
                          cfg.dtype, name=f"layer_{i}")(x, causal_mask=None)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_ln")(x[:, 0])
        proj = nn.Dense(cfg.projection_dim, use_bias=False, dtype=jnp.float32,
                        name="visual_projection")(pooled)
        return proj, x


# numpy on purpose: a module-level jnp.array initializes the JAX backend
# AT IMPORT, before any entry point can force the CPU platform (standalone
# scripts crashed with "Unable to initialize backend 'axon'")
import numpy as _np

CLIP_IMAGE_MEAN = _np.array([0.48145466, 0.4578275, 0.40821073], _np.float32)
CLIP_IMAGE_STD = _np.array([0.26862954, 0.26130258, 0.27577711], _np.float32)


def clip_preprocess(images: jax.Array, size: int = 224) -> jax.Array:
    """[B, H, W, 3] in [0, 1] → resized + CLIP-normalized (bilinear, matching
    kornia resize in ldm encoders/modules.py:365-371)."""
    B = images.shape[0]
    from ..ops.resize import resize_bilinear
    x = resize_bilinear(images, (size, size))
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
