"""DeepFloyd IF stage-1 guidance (pixel-space SDS).

TPU-native re-implementation of /root/reference/guidance/if_utils.py: no
VAE — renders are resized to 64² and diffused directly; the UNet predicts
(eps, variance) in 6 channels and the variance half is discarded
(if_utils.py:92-94).  The cosine ("squaredcos_cap_v2") schedule replaces
diffusers' DDPMScheduler.

Text embeddings come from T5 — a one-time host-side step.  With no weights
available the same hash-tokenizer + random-embedding fallback as SD applies
(embedding dim 4096 matches T5-XXL so shapes are exact).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.unet import UNet2DCondition, UNetConfig
from .perpneg import weighted_perpendicular_aggregator
from .schedule import NoiseSchedule, make_schedule
from ..ops.resize import resize_bilinear


@dataclass(frozen=True)
class IFConfig:
    image_size: int = 64
    t_range: Tuple[float, float] = (0.02, 0.98)
    num_train_timesteps: int = 1000
    context_dim: int = 4096       # T5-XXL
    max_len: int = 77
    tiny: bool = False

    def unet_config(self) -> UNetConfig:
        if self.tiny:
            return UNetConfig.tiny(in_channels=3, out_channels=6)
        return UNetConfig.if_stage1()

    @property
    def min_step(self) -> int:
        return int(self.num_train_timesteps * self.t_range[0])

    @property
    def max_step(self) -> int:
        return int(self.num_train_timesteps * self.t_range[1])


class IFGuidance:
    def __init__(self, cfg: IFConfig):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet_config())
        self.schedule: NoiseSchedule = make_schedule(
            "squaredcos_cap_v2", cfg.num_train_timesteps)

    @property
    def _ctx_dim(self):
        return self.unet.cfg.context_dim

    @property
    def _size(self):
        return 16 if self.cfg.tiny else self.cfg.image_size

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        s = self._size
        p = self.unet.init(key, jnp.zeros((1, s, s, 3)), jnp.zeros((1,)),
                           jnp.zeros((1, self.cfg.max_len, self._ctx_dim))
                           )["params"]
        return {"unet": p}

    def prepare_embeddings(self, params, text: str, negative: str = ""
                           ) -> Dict[str, jax.Array]:
        """T5 embeddings when weights exist; deterministic random fallback
        otherwise (shapes exact). Includes per-direction variants."""
        import hashlib

        import numpy as np

        def fake(t: str) -> jax.Array:
            seed = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            rng = np.random.default_rng(seed)
            return jnp.asarray(rng.normal(
                size=(1, self.cfg.max_len, self._ctx_dim)).astype(np.float32)
                * 0.02)

        out = {"default": fake(text), "uncond": fake(negative)}
        for d in ("front", "side", "back"):
            out[d] = fake(f"{text}, {d} view")
        return out

    def _sds(self, images, noise, noise_pred, t, grad_scale):
        w = 1.0 - jnp.asarray(self.schedule.alphas_cumprod)[t]
        grad = grad_scale * w[:, None, None, None] * (noise_pred - noise)
        grad = jnp.nan_to_num(grad)
        targets = jax.lax.stop_gradient(images - grad)
        B = images.shape[0]
        return 0.5 * jnp.sum((images.astype(jnp.float32) - targets) ** 2) / B

    def sds_loss(self, params, key, text_z_cond, text_z_uncond, pred_rgb,
                 guidance_scale: float = 100.0, as_latent: bool = False,
                 grad_scale: float = 1.0):
        """pixel-space SDS (if_utils.py:73-107). as_latent ignored (no VAE)."""
        del as_latent
        s = self._size
        B = pred_rgb.shape[0]
        images = resize_bilinear(pred_rgb[..., :3],
                                 (s, s)) * 2.0 - 1.0
        k_t, k_noise = jax.random.split(key)
        t = jax.random.randint(k_t, (B,), self.cfg.min_step,
                               self.cfg.max_step + 1)
        noise = jax.random.normal(k_noise, images.shape)
        noisy = jax.lax.stop_gradient(
            self.schedule.add_noise(images, noise, t))

        x_in = jnp.concatenate([noisy] * 2)
        t_in = jnp.concatenate([t] * 2)
        ctx = jnp.concatenate([text_z_uncond, text_z_cond])
        out = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
        eps, _var = jnp.split(out, 2, axis=-1)
        e_u, e_c = jnp.split(eps, 2)
        noise_pred = e_u + guidance_scale * (e_c - e_u)
        return self._sds(images, noise, noise_pred, t, grad_scale)

    def sds_loss_perpneg(self, params, key, text_z, weights, text_z_uncond,
                         pred_rgb, guidance_scale: float = 100.0,
                         as_latent: bool = False, grad_scale: float = 1.0):
        """if_utils.py:110-149."""
        del as_latent
        s = self._size
        B = pred_rgb.shape[0]
        K = text_z.shape[0] // B
        images = resize_bilinear(pred_rgb[..., :3],
                                 (s, s)) * 2.0 - 1.0
        k_t, k_noise = jax.random.split(key)
        t = jax.random.randint(k_t, (B,), self.cfg.min_step,
                               self.cfg.max_step + 1)
        noise = jax.random.normal(k_noise, images.shape)
        noisy = jax.lax.stop_gradient(
            self.schedule.add_noise(images, noise, t))

        x_in = jnp.concatenate([noisy] * (1 + K))
        t_in = jnp.concatenate([t] * (1 + K))
        ctx = jnp.concatenate([text_z_uncond, text_z])
        out = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
        eps, _var = jnp.split(out, 2, axis=-1)
        e_u, e_text = eps[:B], eps[B:]
        delta = e_text - jnp.tile(e_u, (K, 1, 1, 1))
        noise_pred = e_u + guidance_scale * \
            weighted_perpendicular_aggregator(delta, weights, B)
        return self._sds(images, noise, noise_pred, t, grad_scale)

    def produce_imgs(self, params, key, text_z_cond, text_z_uncond,
                     num_inference_steps: int = 20,
                     guidance_scale: float = 7.0):
        """Standalone txt2img at 64² (if_utils.py:152-203)."""
        s = self._size
        B = text_z_cond.shape[0]
        key, k0 = jax.random.split(key)
        images = jax.random.normal(k0, (B, s, s, 3))
        T = self.cfg.num_train_timesteps
        step = T // num_inference_steps
        timesteps = list(range(T - 1, -1, -step))[:num_inference_steps]
        for i, t in enumerate(timesteps):
            t_prev = timesteps[i + 1] if i + 1 < len(timesteps) else -1
            x_in = jnp.concatenate([images] * 2)
            t_in = jnp.full((2 * B,), t)
            ctx = jnp.concatenate([text_z_uncond, text_z_cond])
            out = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
            eps, _ = jnp.split(out, 2, axis=-1)
            e_u, e_c = jnp.split(eps, 2)
            eps_g = e_u + guidance_scale * (e_c - e_u)
            images = self.schedule.ddim_step(
                images, eps_g, jnp.full((B,), t), jnp.full((B,), t_prev))
        return jnp.clip(images / 2 + 0.5, 0, 1)


def _main(argv=None):
    """Standalone pixel-space txt2img sanity CLI (reference
    if_utils.py:205-230): python -m dreamfusion_tpu.guidance.deepfloyd
    "prompt" [--tiny] [--weights dir] [--steps 20] [--out p.png]"""
    import argparse
    import os

    import numpy as np

    ap = argparse.ArgumentParser("deepfloyd-if txt2img")
    ap.add_argument("prompt", type=str)
    ap.add_argument("--negative", default="")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--scale", type=float, default=7.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="if_sample.png")
    args = ap.parse_args(argv)

    from ..utils.platform import honor_cpu_env
    honor_cpu_env()

    from ..utils.image import save_image

    g = IFGuidance(IFConfig(tiny=args.tiny))
    params = g.init_params(jax.random.PRNGKey(args.seed))
    if args.weights:
        from ..utils.params import maybe_load_params
        for k in params:
            params[k] = maybe_load_params(
                os.path.join(args.weights, f"{k}.npz"), k, params[k])
    # IF embeds via T5 (its own prepare_embeddings handles the no-weights
    # fallback; reference if_utils.py:66-68)
    emb = g.prepare_embeddings(params, args.prompt, negative=args.negative)
    img = g.produce_imgs(params, jax.random.PRNGKey(args.seed),
                         emb["default"], emb["uncond"],
                         num_inference_steps=args.steps,
                         guidance_scale=args.scale)
    save_image(args.out, np.asarray(img[0]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    _main()
