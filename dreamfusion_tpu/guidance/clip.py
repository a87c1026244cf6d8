"""CLIP guidance: cosine-similarity loss between renders and a prompt/image.

TPU-native re-implementation of /root/reference/guidance/clip_utils.py.
Unlike the diffusion priors, gradients DO flow through the CLIP vision
tower into the render, so the tower must live in JAX (ViT-B/16 by default,
matching clip_utils.py:14).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.clip import (CLIPTextConfig, CLIPTextEncoder, CLIPVisionConfig,
                           CLIPVisionEncoder, clip_preprocess)


@dataclass(frozen=True)
class CLIPConfig:
    tiny: bool = False

    def vision_config(self) -> CLIPVisionConfig:
        return CLIPVisionConfig.tiny() if self.tiny else CLIPVisionConfig.vit_b16()

    def text_config(self) -> CLIPTextConfig:
        if self.tiny:
            return CLIPTextConfig.tiny()
        return CLIPTextConfig(hidden_size=512, num_layers=12, num_heads=8)


class CLIPGuidance:
    def __init__(self, cfg: CLIPConfig):
        self.cfg = cfg
        self.vision = CLIPVisionEncoder(cfg.vision_config())
        self.text = CLIPTextEncoder(cfg.text_config())

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        kv, kt, kp = jax.random.split(key, 3)
        vc = self.cfg.vision_config()
        vision_p = self.vision.init(
            kv, jnp.zeros((1, vc.image_size, vc.image_size, 3)))["params"]
        tc = self.cfg.text_config()
        text_p = self.text.init(kt, jnp.zeros((1, tc.max_len), jnp.int32)
                                )["params"]
        # text projection to the shared space
        proj = jax.random.normal(kp, (tc.hidden_size, vc.projection_dim)) * 0.02
        return {"vision": vision_p, "text": text_p, "text_projection": proj}

    def load_pretrained(self, root: str) -> Dict[str, Any]:
        """Converted weights from `root/clip.npz` (written by
        `utils.convert --kind clip`); missing file keeps random params."""
        from ..utils.params import maybe_load_params
        params = self.init_params(jax.random.PRNGKey(0))
        return maybe_load_params(root, "clip", params)

    def get_img_embeds(self, params, images: jax.Array) -> jax.Array:
        """[B, H, W, 3] in [0,1] → normalized [B, proj]."""
        vc = self.cfg.vision_config()
        px = clip_preprocess(images, vc.image_size)
        z, _ = self.vision.apply({"params": params["vision"]}, px)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def get_text_embeds(self, params, input_ids: jax.Array) -> jax.Array:
        pooled = self.text.apply({"params": params["text"]}, input_ids,
                                 method=self.text.pooled)
        z = pooled @ params["text_projection"]
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def prepare_embeddings(self, params, text: Optional[str] = None,
                           image=None) -> Dict[str, jax.Array]:
        """clip_z dict with 'text' and/or 'image' normalized embeds
        (reference Trainer.prepare_embeddings, nerf/utils.py:419-421)."""
        out: Dict[str, jax.Array] = {}
        if text:
            from .embeddings import load_tokenizer
            tc = self.cfg.text_config()
            tok = load_tokenizer(None, tc.vocab_size, tc.max_len)
            out["text"] = self.get_text_embeds(params, jnp.asarray(tok(text)))
        if image is not None:
            img = jnp.asarray(image)
            if img.ndim == 3:
                img = img[None]
            out["image"] = self.get_img_embeds(params, img[..., :3])
        return out

    def loss(self, params, clip_z: Dict[str, jax.Array], pred_rgb: jax.Array,
             grad_scale: jax.Array | float = 10.0) -> jax.Array:
        """-cos_sim(render, targets) (clip_utils.py:37-53)."""
        image_z = self.get_img_embeds(params, pred_rgb[..., :3])
        loss = jnp.zeros(())
        if "image" in clip_z:
            loss = loss - jnp.mean(
                jnp.sum(image_z * clip_z["image"], axis=-1) * grad_scale)
        if "text" in clip_z:
            loss = loss - jnp.mean(
                jnp.sum(image_z * clip_z["text"], axis=-1) * grad_scale)
        return loss
