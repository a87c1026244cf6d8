"""DeepFloyd IF stage-1 guidance (pixel-space SDS).

TPU-native re-implementation of /root/reference/guidance/if_utils.py: no
VAE — renders are resized to 64² and diffused directly; the UNet predicts
(eps, variance) in 6 channels and the variance half is discarded
(if_utils.py:92-94).  The cosine ("squaredcos_cap_v2") schedule replaces
diffusers' DDPMScheduler.

The UNet is the real IF topology (models/if_unet.py — SimpleCrossAttn
blocks, scale_shift resnets, attention-pooled text additive embedding),
config-derivable from a checkpoint's own `unet/config.json`.

Text embeddings come from T5 (models/t5.py) — a one-time host-side step,
mirroring `pipe.text_encoder` (if_utils.py:66-68).  When a weights dir
with `t5.npz` exists the real encoder runs; otherwise the same
hash-tokenizer + random-embedding fallback as SD applies (embedding dim
4096 matches T5-XXL so shapes are exact).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.if_unet import IFUNet, IFUNetConfig
from ..models.t5 import T5Config, T5Encoder
from .perpneg import weighted_perpendicular_aggregator
from .schedule import NoiseSchedule, make_schedule
from ..ops.resize import resize_bilinear


@dataclass(frozen=True)
class IFConfig:
    image_size: int = 64
    t_range: Tuple[float, float] = (0.02, 0.98)
    num_train_timesteps: int = 1000
    max_len: int = 77
    tiny: bool = False
    unet_config_json: Optional[str] = None   # diffusers unet/config.json

    def unet_config(self) -> IFUNetConfig:
        if self.unet_config_json:
            import json
            with open(self.unet_config_json) as f:
                return IFUNetConfig.from_diffusers_config(json.load(f))
        if self.tiny:
            return IFUNetConfig.tiny()
        return IFUNetConfig.xl()

    def t5_config(self) -> T5Config:
        return T5Config.tiny() if self.tiny else T5Config.xxl()

    @property
    def min_step(self) -> int:
        return int(self.num_train_timesteps * self.t_range[0])

    @property
    def max_step(self) -> int:
        return int(self.num_train_timesteps * self.t_range[1])


class IFGuidance:
    def __init__(self, cfg: IFConfig):
        self.cfg = cfg
        self.unet = IFUNet(cfg.unet_config())
        self.t5 = T5Encoder(cfg.t5_config())
        self.schedule: NoiseSchedule = make_schedule(
            "squaredcos_cap_v2", cfg.num_train_timesteps)

    @property
    def _ctx_dim(self):
        return self.unet.cfg.encoder_hid_dim

    @property
    def _size(self):
        return 16 if self.cfg.tiny else self.cfg.image_size

    def init_params(self, key: jax.Array, dtype=None) -> Dict[str, Any]:
        s = self._size
        if self.cfg.tiny:
            p = self.unet.init(
                key, jnp.zeros((1, s, s, 3)), jnp.zeros((1,)),
                jnp.zeros((1, self.cfg.max_len, self._ctx_dim)))["params"]
            return {"unet": p}
        # full size (IF-XL ≈ 4.2B params): slab init, never a giant flax
        # init-program compile through the tunnel (utils/params docstring)
        import numpy as np

        from ..utils.params import fast_random_params
        p = fast_random_params(
            lambda: self.unet.init(
                jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)),
                jnp.zeros((1,)),
                jnp.zeros((1, self.cfg.max_len, self._ctx_dim)))["params"],
            seed=0, dtype=np.float32 if dtype is None else dtype)
        return {"unet": p}

    def load_pretrained(self, root: str) -> Dict[str, Any]:
        """Converted weights from `root/{unet,t5}.npz` (utils.convert
        --kind if) or a raw diffusers IF directory converted on the fly
        (reference: IFPipeline.from_pretrained, if_utils.py:35-48)."""
        import os

        params = self.init_params(jax.random.PRNGKey(0))
        npz = [os.path.join(root, f"{n}.npz") for n in ("unet", "t5")]
        if os.path.isdir(root) and any(os.path.exists(p) for p in npz):
            from ..utils.params import maybe_load_params
            params["unet"] = maybe_load_params(npz[0], "unet",
                                               params["unet"])
            if os.path.exists(npz[1]):
                t5_template = self.t5.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 8), jnp.int32))["params"]
                params["t5"] = maybe_load_params(npz[1], "t5", t5_template)
            return params
        from ..utils.convert import convert_if
        return convert_if(root, self, params)

    def encode_text(self, t5_params, text: str,
                    pretrained_root: str | None = None) -> jax.Array:
        """Run the Flax T5 encoder.  Real tokenizer (T5TokenizerFast from a
        local tokenizer.json — no sentencepiece needed) when
        `pretrained_root` has one; deterministic hash tokenizer otherwise."""
        import numpy as np

        ids = None
        if pretrained_root:
            try:
                from transformers import T5TokenizerFast
                tok = T5TokenizerFast.from_pretrained(pretrained_root)
                out = tok(text, padding="max_length",
                          max_length=self.cfg.max_len, truncation=True,
                          return_tensors="np")
                ids = out["input_ids"].astype(np.int32)
                mask = out["attention_mask"].astype(np.int32)
            except Exception:
                ids = None
        if ids is None:
            from .embeddings import HashTokenizer
            ids = HashTokenizer(self.t5.cfg.vocab_size, self.cfg.max_len)(
                text)
            mask = np.ones_like(ids)
        return self.t5.apply({"params": t5_params}, jnp.asarray(ids),
                             jnp.asarray(mask))

    def prepare_embeddings(self, params, text: str, negative: str = ""
                           ) -> Dict[str, jax.Array]:
        """T5 embeddings when weights exist (params['t5'] present);
        deterministic random fallback otherwise (shapes exact).  Includes
        per-direction variants (reference main.py builds view prompts)."""
        import hashlib

        import numpy as np

        t5p = params.get("t5") if isinstance(params, dict) else None
        if t5p is not None:
            # upload the T5 tower once; host-side (numpy) leaves would be
            # re-transferred on every encode_text call below
            t5p = jax.device_put(t5p)

        def embed(t: str) -> jax.Array:
            if t5p is not None:
                return self.encode_text(t5p, t)
            seed = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            rng = np.random.default_rng(seed)
            return jnp.asarray(rng.normal(
                size=(1, self.cfg.max_len, self._ctx_dim)).astype(np.float32)
                * 0.02)

        out = {"default": embed(text), "uncond": embed(negative)}
        for d in ("front", "side", "back"):
            out[d] = embed(f"{text}, {d} view")
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

    def guidance_eval(self, params, key, text_z_cond, text_z_uncond,
                      pred_rgb, guidance_scale: float = 100.0):
        """Debug snapshot for --save_guidance: (noisy render, one-step
        denoised x0), both pixel-space [B,s,s,3] in [0,1] (the reference's
        save_guidance path works for IF too, nerf/utils.py:1028-1048)."""
        s = self._size
        B = pred_rgb.shape[0]
        images = resize_bilinear(pred_rgb[..., :3], (s, s)) * 2.0 - 1.0
        k_t, k_noise = jax.random.split(key)
        t = jax.random.randint(k_t, (B,), self.cfg.min_step,
                               self.cfg.max_step + 1)
        noise = jax.random.normal(k_noise, images.shape)
        noisy = self.schedule.add_noise(images, noise, t)
        x_in = jnp.concatenate([noisy] * 2)
        t_in = jnp.concatenate([t] * 2)
        ctx = jnp.concatenate([text_z_uncond, text_z_cond])
        out = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
        eps, _var = jnp.split(out, 2, axis=-1)
        e_u, e_c = jnp.split(eps, 2)
        noise_pred = e_u + guidance_scale * (e_c - e_u)
        x0 = self.schedule.predict_start_from_noise(noisy, t, noise_pred)
        return (jnp.clip(noisy / 2 + 0.5, 0, 1),
                jnp.clip(x0 / 2 + 0.5, 0, 1))

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
    if args.weights:
        params = g.load_pretrained(args.weights)
    else:
        params = g.init_params(jax.random.PRNGKey(args.seed))
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
