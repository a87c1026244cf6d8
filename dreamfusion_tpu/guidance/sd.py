"""Stable Diffusion SDS guidance.

TPU-native re-implementation of /root/reference/guidance/sd_utils.py:
the frozen SD UNet + VAE run inside the *same* jitted train step as the
NeRF render (the reference crosses the autograd boundary with
`torch.no_grad()`; here `stop_gradient` on the noised latents cuts the
same edge, so no UNet backward is ever built).

Functional design: the guidance owns frozen module *definitions* and a
params pytree; every loss is a pure function (params, key, inputs) → loss.
Images are NHWC in [0, 1].
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.clip import CLIPTextConfig, CLIPTextEncoder
from ..models.unet import UNet2DCondition, UNetConfig
from ..models.vae import AutoencoderKL, VAEConfig
from .perpneg import weighted_perpendicular_aggregator
from .schedule import NoiseSchedule, make_schedule
from ..ops.resize import resize_bilinear

# probe knob: remat the VAE encoder (see encode_imgs docstring)
import os as _os
_REMAT_ENCODE = _os.environ.get("DFTPU_REMAT_VAE", "0") == "1"


@dataclass(frozen=True)
class SDConfig:
    sd_version: str = "2.1"
    image_size: int = 512          # resolution fed to the VAE
    latent_size: int = 64
    t_range: Tuple[float, float] = (0.02, 0.98)
    num_train_timesteps: int = 1000
    tiny: bool = False             # test-scale everything

    def unet_config(self) -> UNetConfig:
        if self.tiny:
            return UNetConfig.tiny()
        return UNetConfig.sd21() if self.sd_version.startswith("2") else UNetConfig.sd15()

    def vae_config(self) -> VAEConfig:
        return VAEConfig.tiny() if self.tiny else VAEConfig.sd()

    def text_config(self) -> CLIPTextConfig:
        if self.tiny:
            return CLIPTextConfig.tiny()
        return (CLIPTextConfig.sd21() if self.sd_version.startswith("2")
                else CLIPTextConfig.sd15())

    @property
    def min_step(self) -> int:
        return int(self.num_train_timesteps * self.t_range[0])

    @property
    def max_step(self) -> int:
        return int(self.num_train_timesteps * self.t_range[1])


class StableDiffusionGuidance:
    """Holds module defs + schedule; params are passed explicitly."""

    def __init__(self, cfg: SDConfig):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet_config())
        self.vae = AutoencoderKL(cfg.vae_config())
        self.text_encoder = CLIPTextEncoder(cfg.text_config())
        self.schedule: NoiseSchedule = make_schedule(
            "scaled_linear", cfg.num_train_timesteps)

    # ---- init (random weights; real weights via load_pretrained) ----
    def init_params(self, key: jax.Array, dtype=None) -> Dict[str, Any]:
        """dtype: generation dtype for the full-size towers (pass
        jnp.bfloat16 to emit the frozen-tower dtype directly — one slab
        program per tower, no separate cast; startup cost is per-program,
        scripts/probe_fence_tax.py)."""
        import numpy as np

        from ..utils.params import fast_random_params
        dtype = np.float32 if dtype is None else dtype
        ku, kv, kt = jax.random.split(key, 3)
        ls = self.cfg.latent_size
        ims = ls * self.vae.cfg.downscale
        assert ims == self.cfg.image_size, (
            f"image_size {self.cfg.image_size} must equal latent_size*"
            f"{self.vae.cfg.downscale}")
        ctx = self.unet.cfg.context_dim
        tl = self.text_encoder.cfg.max_len
        if self.cfg.tiny:
            unet_p = self.unet.init(
                ku, jnp.zeros((1, ls, ls, self.unet.cfg.in_channels)),
                jnp.zeros((1,)), jnp.zeros((1, tl, ctx)))["params"]
            vae_p = self.vae.init(kv, jnp.zeros((1, ims, ims, 3)), kv)["params"]
            text_p = self.text_encoder.init(
                kt, jnp.zeros((1, tl), jnp.int32))["params"]
            return {"unet": unet_p, "vae": vae_p, "text": text_p}
        # full size: host-side shape-faithful init (no giant init compile)
        unet_p = fast_random_params(
            lambda: self.unet.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, ls, ls, self.unet.cfg.in_channels)),
                jnp.zeros((1,)), jnp.zeros((1, tl, ctx)))["params"], seed=0, dtype=dtype)
        vae_p = fast_random_params(
            lambda: self.vae.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, ims, ims, 3)),
                                  jax.random.PRNGKey(0))["params"], seed=1, dtype=dtype)
        text_p = fast_random_params(
            lambda: self.text_encoder.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, tl), jnp.int32))["params"], seed=2, dtype=dtype)
        return {"unet": unet_p, "vae": vae_p, "text": text_p}

    def load_pretrained(self, root: str) -> Dict[str, Any]:
        """Converted weights from `root/{unet,vae,text}.npz`
        (written by utils.convert) — or a raw diffusers dir / CompVis ckpt,
        converted on the fly."""
        import os

        import jax

        params = self.init_params(jax.random.PRNGKey(0))
        if any(os.path.exists(os.path.join(root, f"{n}.npz"))
               for n in ("unet", "vae", "text")):
            from ..utils.params import maybe_load_params
            for n in ("unet", "vae", "text"):
                p = os.path.join(root, f"{n}.npz")
                if os.path.exists(p):
                    params[n] = maybe_load_params(p, n, params[n])
            return params
        from ..utils.convert import convert_sd
        return convert_sd(root, self, params)

    # ---- text embedding (one-time, reference sd_utils.py:76-83) ---------
    def get_text_embeds(self, params, input_ids: jax.Array) -> jax.Array:
        return self.text_encoder.apply({"params": params["text"]}, input_ids)

    # ---- VAE helpers ----------------------------------------------------
    def encode_imgs(self, params, key, imgs: jax.Array) -> jax.Array:
        """[B, H, W, 3] in [0,1] → scaled latents. Differentiable.

        _REMAT_ENCODE (env DFTPU_REMAT_VAE=1) reruns the encoder forward
        during the backward instead of saving residuals — a probe knob for
        the ~12 ms whole-graph VAE-backward scheduling overhead
        (CLAUDE.md gotcha 13).  Measured: OFF is faster (see README perf
        dead-end table); kept as a switch for future HBM-pressure cases."""
        def enc(x):
            moments = self.vae.apply({"params": params["vae"]},
                                     x * 2.0 - 1.0, method=self.vae.encode)
            return moments.sample(key) * self.vae.cfg.scale_factor
        if _REMAT_ENCODE:
            enc = jax.checkpoint(enc)
        return enc(imgs)

    def decode_latents(self, params, latents: jax.Array) -> jax.Array:
        imgs = self.vae.apply({"params": params["vae"]}, latents,
                              method=self.vae.decode)
        return jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)

    # ---- latent prep shared by sds / sds_perpneg ------------------------
    def _to_latents(self, params, key, pred_rgb, as_latent):
        """as_latent may be a python bool (two separate compiled programs,
        the pre-r5 behavior) or a TRACED scalar bool.  The traced form lets
        one fused executable cover both the normal-as-latent warmup and the
        main phase — first-execution of a program through the tunnel costs
        ~0.5 s per serialized MB (scripts/probe_fence_tax.py), so one
        ~100 MB step program instead of two is ~60 s of startup.  Traced
        callers must pass [B, h, w, 4] (rgb + alpha); lax.cond executes
        only the taken branch per step, and its transpose keeps the VAE
        backward out of warmup steps."""
        if not isinstance(as_latent, bool):
            assert pred_rgb.shape[-1] == 4, (
                "traced as_latent requires a 4-channel (rgb+alpha) render")

            def direct(p4):
                return resize_bilinear(
                    p4, (self.cfg.latent_size,
                         self.cfg.latent_size)) * 2.0 - 1.0

            def vae(p4):
                size = self.cfg.image_size
                rgb = resize_bilinear(p4[..., :3], (size, size))
                return self.encode_imgs(params, key, rgb)

            return jax.lax.cond(as_latent, direct, vae, pred_rgb)
        if as_latent:
            # pred_rgb is [B, h, w, 4] (rgb + alpha); straight to latent space
            lat = resize_bilinear(
                pred_rgb, (self.cfg.latent_size,
                           self.cfg.latent_size)) * 2.0 - 1.0
            return lat
        size = self.cfg.image_size
        rgb = resize_bilinear(pred_rgb, (size, size))
        return self.encode_imgs(params, key, rgb)

    def _sample_t(self, key, B):
        return jax.random.randint(key, (B,), self.cfg.min_step,
                                  self.cfg.max_step + 1)

    def _sds_from_noise_pred(self, latents, noise, noise_pred, t, grad_scale):
        """Reparameterized SDS loss (sd_utils.py:154-162)."""
        w = (1.0 - jnp.asarray(self.schedule.alphas_cumprod)[t])
        w = w.reshape(-1, 1, 1, 1)
        grad = grad_scale * w * (noise_pred - noise)
        grad = jnp.nan_to_num(grad)
        targets = jax.lax.stop_gradient(latents - grad)
        B = latents.shape[0]
        return 0.5 * jnp.sum((latents.astype(jnp.float32) - targets) ** 2) / B

    # ---- SDS (sd_utils.py:86-162) ---------------------------------------
    def sds_loss(self, params, key, text_z_cond, text_z_uncond, pred_rgb,
                 guidance_scale: float = 100.0, as_latent: bool = False,
                 grad_scale: float = 1.0):
        """text_z_*: [B, L, D]; pred_rgb: [B, h, w, 3 or 4] in [0,1]."""
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        latents = self._to_latents(params, k_enc, pred_rgb, as_latent)
        B = latents.shape[0]
        t = self._sample_t(k_t, B)
        noise = jax.random.normal(k_noise, latents.shape)
        latents_noisy = jax.lax.stop_gradient(
            self.schedule.add_noise(latents, noise, t))

        x_in = jnp.concatenate([latents_noisy] * 2)
        t_in = jnp.concatenate([t] * 2)
        ctx = jnp.concatenate([text_z_uncond, text_z_cond])
        eps = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
        eps_uncond, eps_cond = jnp.split(eps, 2)
        noise_pred = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
        return self._sds_from_noise_pred(latents, noise, noise_pred, t,
                                         grad_scale)

    def guidance_eval(self, params, key, text_z_cond, text_z_uncond,
                      pred_rgb, guidance_scale: float = 100.0):
        """Debug snapshot for --save_guidance (sd_utils.py:133-158):
        returns (noisy render, one-step denoised pred_x0) decoded to rgb."""
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        latents = self._to_latents(params, k_enc, pred_rgb, False)
        B = latents.shape[0]
        t = self._sample_t(k_t, B)
        noise = jax.random.normal(k_noise, latents.shape)
        latents_noisy = self.schedule.add_noise(latents, noise, t)
        x_in = jnp.concatenate([latents_noisy] * 2)
        t_in = jnp.concatenate([t] * 2)
        ctx = jnp.concatenate([text_z_uncond, text_z_cond])
        eps = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
        eps_u, eps_c = jnp.split(eps, 2)
        noise_pred = eps_u + guidance_scale * (eps_c - eps_u)
        x0 = self.schedule.predict_start_from_noise(latents_noisy, t,
                                                    noise_pred)
        return (self.decode_latents(params, latents_noisy),
                self.decode_latents(params, x0))

    # ---- SDS + Perp-Neg (sd_utils.py:166-247) ---------------------------
    def sds_loss_perpneg(self, params, key, text_z, weights, text_z_uncond,
                         pred_rgb, guidance_scale: float = 100.0,
                         as_latent: bool = False, grad_scale: float = 1.0):
        """text_z: [B*K, L, D] interleaved; weights: [B*K];
        text_z_uncond: [B, L, D]."""
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        latents = self._to_latents(params, k_enc, pred_rgb, as_latent)
        B = latents.shape[0]
        K = text_z.shape[0] // B
        t = self._sample_t(k_t, B)
        noise = jax.random.normal(k_noise, latents.shape)
        latents_noisy = jax.lax.stop_gradient(
            self.schedule.add_noise(latents, noise, t))

        x_in = jnp.concatenate([latents_noisy] * (1 + K))
        t_in = jnp.concatenate([t] * (1 + K))
        ctx = jnp.concatenate([text_z_uncond, text_z])
        eps = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
        eps_uncond, eps_text = eps[:B], eps[B:]
        delta = eps_text - jnp.tile(eps_uncond, (K, 1, 1, 1))
        noise_pred = eps_uncond + guidance_scale * \
            weighted_perpendicular_aggregator(delta, weights, B)
        return self._sds_from_noise_pred(latents, noise, noise_pred, t,
                                         grad_scale)

    # ---- standalone txt2img (sd_utils.py:250-346) -----------------------
    def produce_latents(self, params, key, text_z_cond, text_z_uncond,
                        num_inference_steps: int = 50,
                        guidance_scale: float = 7.5,
                        latents: Optional[jax.Array] = None):
        B = text_z_cond.shape[0]
        ls = self.cfg.latent_size
        zc = self.unet.cfg.in_channels
        if latents is None:
            key, k0 = jax.random.split(key)
            latents = jax.random.normal(k0, (B, ls, ls, zc))

        T = self.cfg.num_train_timesteps
        step = T // num_inference_steps
        timesteps = list(range(T - 1, -1, -step))[:num_inference_steps]

        @jax.jit
        def _step(lat, t, t_prev):
            x_in = jnp.concatenate([lat] * 2)
            t_in = jnp.full((2 * B,), t)
            ctx = jnp.concatenate([text_z_uncond, text_z_cond])
            eps = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
            e_u, e_c = jnp.split(eps, 2)
            eps_g = e_u + guidance_scale * (e_c - e_u)
            return self.schedule.ddim_step(
                lat, eps_g, jnp.full((B,), t), jnp.full((B,), t_prev))

        for i, t in enumerate(timesteps):
            t_prev = timesteps[i + 1] if i + 1 < len(timesteps) else -1
            latents = _step(latents, t, t_prev)
        return latents

    def prompt_to_img(self, params, key, text_z_cond, text_z_uncond, **kw):
        latents = self.produce_latents(params, key, text_z_cond,
                                       text_z_uncond, **kw)
        return self.decode_latents(params, latents)


def _main(argv=None):
    """Standalone txt2img sanity CLI (reference sd_utils.py:318-346):
    python -m dreamfusion_tpu.guidance.sd "a photo of a hamburger"
    [--tiny] [--weights dir-of-npz] [--steps 50] [--scale 7.5] [--out p.png]
    """
    import argparse
    import os

    import numpy as np

    ap = argparse.ArgumentParser("sd txt2img")
    ap.add_argument("prompt", type=str)
    ap.add_argument("--negative", default="")
    ap.add_argument("--sd_version", default="2.1")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--weights", default=None,
                    help="dir with unet.npz/vae.npz/text.npz (utils.convert)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=7.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="sd_sample.png")
    args = ap.parse_args(argv)

    from ..utils.platform import honor_cpu_env
    honor_cpu_env()

    from ..utils.image import save_image
    from .embeddings import prepare_text_embeddings

    g = StableDiffusionGuidance(
        SDConfig(sd_version=args.sd_version, tiny=args.tiny,
                 **({"image_size": 16, "latent_size": 8} if args.tiny else {})))
    if args.weights:
        # converted-npz bundle, a raw diffusers dir, or a CompVis ckpt
        params = g.load_pretrained(args.weights)
    else:
        params = g.init_params(jax.random.PRNGKey(args.seed))
    emb = prepare_text_embeddings(g, params, args.prompt,
                                  negative=args.negative,
                                  pretrained_root=args.weights)
    img = g.prompt_to_img(params, jax.random.PRNGKey(args.seed),
                          emb["default"], emb["uncond"],
                          num_inference_steps=args.steps,
                          guidance_scale=args.scale)
    save_image(args.out, np.asarray(img[0]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    _main()
