"""Zero-1-to-3 guidance: image-conditioned novel-view SDS.

TPU-native re-implementation of /root/reference/guidance/zero123_utils.py +
the live subset of the vendored ldm stack it drives (SURVEY.md Appendix A):
`LatentDiffusion.apply_model` with hybrid conditioning becomes a single
Flax UNet call on 8 input channels (4 noisy latent + 4 c_concat) with
cross-attention context `cc_projection(cat(CLIP_image_embed, camera_T))`.

Structural TPU-first change: the reference loops over reference images and
runs the UNet once per ref (zero123_utils.py:158-180); here all K refs are
stacked into ONE batched UNet call of size 2*K*B (uncond+cond × refs),
keeping the MXU fed and the graph static.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPVisionConfig, CLIPVisionEncoder, clip_preprocess
from ..models.unet import UNet2DCondition, UNetConfig
from ..models.vae import AutoencoderKL, VAEConfig
from .schedule import NoiseSchedule, make_schedule
from ..ops.resize import resize_bilinear


@dataclass(frozen=True)
class Zero123Config:
    image_size: int = 256
    latent_size: int = 32
    t_range: Tuple[float, float] = (0.02, 0.98)
    num_train_timesteps: int = 1000
    grad_scale_mode: str = "angle"    # angle | None
    tiny: bool = False

    def unet_config(self) -> UNetConfig:
        if self.tiny:
            return UNetConfig.tiny(in_channels=8)
        return UNetConfig.zero123()

    def vae_config(self) -> VAEConfig:
        return VAEConfig.tiny() if self.tiny else VAEConfig.sd()

    def vision_config(self) -> CLIPVisionConfig:
        if self.tiny:
            # projection dim must match the UNet context dim
            from dataclasses import replace as _r
            return _r(CLIPVisionConfig.tiny(),
                      projection_dim=self.unet_config().context_dim)
        return CLIPVisionConfig.vit_l14()

    @property
    def min_step(self) -> int:
        return int(self.num_train_timesteps * self.t_range[0])

    @property
    def max_step(self) -> int:
        return int(self.num_train_timesteps * self.t_range[1])


def spherical_angle_between(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Angle (rad) between spherical coords [..., (r, theta, phi)]
    (reference zero123_utils.py:97-111), pairwise [N, M]."""
    def to_cart(sv):
        r, th, ph = sv[..., 0], sv[..., 1], sv[..., 2]
        return jnp.stack([r * jnp.sin(th) * jnp.cos(ph),
                          r * jnp.sin(th) * jnp.sin(ph),
                          r * jnp.cos(th)], axis=-1)

    a = to_cart(v1)
    b = to_cart(v2)
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
    b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-12)
    cos = jnp.clip(jnp.einsum("nd,md->nm", a, b), -1.0, 1.0)
    return jnp.arccos(cos)


def pose_angle_grad_scale(ref_polars, ref_azimuths, ref_radii,
                          polar, azimuth, radius, mode: str,
                          grad_scale, B: int):
    """Angle-based SDS grad scale + novel↔ref view angles
    (zero123_utils.py:116-127): views far from every reference get a
    stronger pull.  Shared by the real zero123 path and the
    image-conditioned oracle prior (guidance/oracle.ImageOracleGuidance),
    so the oracle convergence proof exercises the SAME pose-weighting
    code.  Returns (grad_scale [B], angles_deg [B, K])."""
    K = ref_polars.shape[0]
    v1 = jnp.stack([radius + ref_radii[0],
                    jnp.deg2rad(polar + ref_polars[0]),
                    jnp.deg2rad(azimuth + ref_azimuths[0])], axis=-1)
    v2 = jnp.stack([ref_radii, jnp.deg2rad(ref_polars),
                    jnp.deg2rad(ref_azimuths)], axis=-1)
    angles = jnp.rad2deg(spherical_angle_between(v1, v2))    # [B, K]
    if mode == "angle":
        out = (jnp.min(angles, axis=1) / (180.0 / K)) * grad_scale
    else:
        # reference 'None' mode literally resets to 1.0
        # (zero123_utils.py:126-127)
        out = jnp.ones((B,))
    return out, angles


class Zero123Guidance:
    def __init__(self, cfg: Zero123Config):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet_config())
        self.vae = AutoencoderKL(cfg.vae_config())
        self.vision = CLIPVisionEncoder(cfg.vision_config())
        self.schedule: NoiseSchedule = make_schedule(
            "scaled_linear", cfg.num_train_timesteps)
        self._ctx_dim = self.unet.cfg.context_dim

    # ------------------------------------------------------------------
    def init_params(self, key: jax.Array, dtype=None) -> Dict[str, Any]:
        ku, kv, kc, kp = jax.random.split(key, 4)
        ls = self.cfg.latent_size if not self.cfg.tiny else 8
        ims = ls * self.vae.cfg.downscale
        ctx = self._ctx_dim
        in_ch = 8 if not self.cfg.tiny else self.unet.cfg.in_channels
        vis = self.cfg.vision_config()
        if self.cfg.tiny:
            unet_p = self.unet.init(
                ku, jnp.zeros((1, ls, ls, in_ch)),
                jnp.zeros((1,)), jnp.zeros((1, 1, ctx)))["params"]
            vae_p = self.vae.init(kv, jnp.zeros((1, ims, ims, 3)),
                                  kv)["params"]
            vision_p = self.vision.init(
                kc, jnp.zeros((1, vis.image_size, vis.image_size,
                               3)))["params"]
        else:
            # full size: slab init per tower — no billion-param flax
            # init-program compile through the tunnel (utils/params)
            import numpy as np

            from ..utils.params import fast_random_params
            dt = np.float32 if dtype is None else dtype
            unet_p = fast_random_params(
                lambda: self.unet.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, ls, ls, in_ch)),
                    jnp.zeros((1,)), jnp.zeros((1, 1, ctx)))["params"],
                seed=0, dtype=dt)
            vae_p = fast_random_params(
                lambda: self.vae.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, ims, ims, 3)),
                    jax.random.PRNGKey(0))["params"], seed=1, dtype=dt)
            vision_p = fast_random_params(
                lambda: self.vision.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, vis.image_size, vis.image_size,
                               3)))["params"], seed=2, dtype=dt)
        # cc_projection: Linear(772 -> 768) initialized as [I_768 | 0]
        # (reference ddpm.py:526-529)
        eye = jnp.concatenate([jnp.eye(ctx), jnp.zeros((4, ctx))], axis=0)
        cc = {"kernel": eye, "bias": jnp.zeros((ctx,))}
        return {"unet": unet_p, "vae": vae_p, "vision": vision_p,
                "cc_projection": cc}

    def load_pretrained(self, root: str) -> Dict[str, Any]:
        """Converted weights from `root/{unet,vae,vision,cc_projection}.npz`
        (utils.convert --kind zero123) or a raw zero123(-xl).ckpt converted
        on the fly."""
        import os

        params = self.init_params(jax.random.PRNGKey(0))
        names = ("unet", "vae", "vision", "cc_projection")
        if os.path.isdir(root) and any(
                os.path.exists(os.path.join(root, f"{n}.npz"))
                for n in names):
            from ..utils.params import maybe_load_params
            for n in names:
                p = os.path.join(root, f"{n}.npz")
                if os.path.exists(p):
                    params[n] = maybe_load_params(p, n, params[n])
            return params
        from ..utils.convert import convert_zero123
        return convert_zero123(root, self, params)

    # ------------------------------------------------------------------
    def encode_imgs(self, params, key, imgs: jax.Array) -> jax.Array:
        m = self.vae.apply({"params": params["vae"]}, imgs * 2.0 - 1.0,
                           method=self.vae.encode)
        return m.sample(key) * self.vae.cfg.scale_factor

    def decode_latents(self, params, latents: jax.Array) -> jax.Array:
        imgs = self.vae.apply({"params": params["vae"]}, latents,
                              method=self.vae.decode)
        return jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)

    def get_img_embeds(self, params, x: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
        """x: [K, H, W, 3] in [0,1] → (c_crossattn [K, 1, ctx],
        c_concat [K, ls, ls, 4]) (reference zero123_utils.py:89-95)."""
        vis = self.cfg.vision_config()
        # reference FrozenCLIPImageEmbedder: kornia-resize, [-1,1]→[0,1],
        # CLIP mean/std normalize (ldm encoders/modules.py:365-371); x is
        # already [0,1] here so clip_preprocess covers resize+normalize.
        px = clip_preprocess(x, vis.image_size)
        proj, _ = self.vision.apply({"params": params["vision"]}, px)
        c_crossattn = proj[:, None, :]                     # [K, 1, ctx]
        m = self.vae.apply({"params": params["vae"]}, x * 2.0 - 1.0,
                           method=self.vae.encode)
        c_concat = m.mode() * 1.0                          # NOT scaled
        return c_crossattn, c_concat

    def prepare_image_embeddings(self, params, images: np.ndarray,
                                 ref_polars: Sequence[float] = (90.0,),
                                 ref_azimuths: Sequence[float] = (0.0,),
                                 ref_radii: Sequence[float] = (3.2,),
                                 zero123_ws: Sequence[float] = (1.0,)
                                 ) -> Dict[str, Any]:
        """One-time embedding prep (Trainer.prepare_embeddings,
        nerf/utils.py:403-417). images: [K, H, W, 3] float in [0,1]."""
        x = jnp.asarray(images)
        if x.ndim == 3:
            x = x[None]
        size = self.cfg.image_size if not self.cfg.tiny else \
            8 * self.vae.cfg.downscale
        x = resize_bilinear(x, (size, size))
        c_crossattn, c_concat = self.get_img_embeds(params, x)
        return {
            "c_crossattn": c_crossattn, "c_concat": c_concat,
            "ref_polars": tuple(ref_polars), "ref_azimuths": tuple(ref_azimuths),
            "ref_radii": tuple(ref_radii), "zero123_ws": tuple(zero123_ws),
        }

    # ------------------------------------------------------------------
    def _camera_T(self, polar, azimuth, radius):
        """Relative-pose embedding [Δpolar_rad, sin(−Δazim), cos(Δazim), Δr]
        (zero123_utils.py:168-170). → [B, 1, 4]"""
        a = jnp.where(azimuth > 180, azimuth - 360, azimuth)
        return jnp.stack([jnp.deg2rad(polar), jnp.sin(jnp.deg2rad(-a)),
                          jnp.cos(jnp.deg2rad(a)), radius], axis=-1)[:, None, :]

    def sds_loss(self, params, key, embeddings, pred_rgb,
                 polar, azimuth, radius,
                 guidance_scale: float = 5.0, as_latent: bool = False,
                 grad_scale: float = 1.0):
        """pred_rgb [B,h,w,3] (or [B,h,w,4] as_latent); polar/azimuth/radius:
        [B] deltas wrt the default view (zero123_utils.py:113-231)."""
        cfg = self.cfg
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        ref_polars = jnp.asarray(embeddings["ref_polars"])
        ref_azimuths = jnp.asarray(embeddings["ref_azimuths"])
        ref_radii = jnp.asarray(embeddings["ref_radii"])
        K = ref_polars.shape[0]
        B = pred_rgb.shape[0]
        ls = cfg.latent_size if not cfg.tiny else 8
        ims = ls * self.vae.cfg.downscale

        grad_scale, angles = pose_angle_grad_scale(
            ref_polars, ref_azimuths, ref_radii, polar, azimuth, radius,
            cfg.grad_scale_mode, grad_scale, B)

        if as_latent:
            latents = resize_bilinear(pred_rgb, (ls, ls)) * 2.0 - 1.0
        else:
            rgb = resize_bilinear(pred_rgb, (ims, ims))
            latents = self.encode_imgs(params, k_enc, rgb)

        t = jax.random.randint(k_t, (B,), cfg.min_step, cfg.max_step + 1)
        noise = jax.random.normal(k_noise, latents.shape)
        latents_noisy = jax.lax.stop_gradient(
            self.schedule.add_noise(latents, noise, t))

        # closeness weights over refs (zero123_utils.py:139-150)
        if K > 1:
            inv = jnp.minimum(1.0 / jnp.maximum(angles, 1e-6), 100.0)
            inv = inv / jnp.max(inv, axis=-1, keepdims=True)
            inv = jnp.where(inv < 0.1, 0.0, inv)
        else:
            inv = jnp.ones((B, K))
        ws = jnp.asarray(embeddings["zero123_ws"])[None, :] * inv   # [B, K]
        ws = ws / jnp.max(ws, axis=-1, keepdims=True)
        ws = jnp.where(ws < 0.1, 0.0, ws)

        # batched hybrid-conditioned UNet over all refs at once
        cc_k = params["cc_projection"]["kernel"]
        cc_b = params["cc_projection"]["bias"]
        x_in = jnp.concatenate([latents_noisy] * 2)                  # [2B,...]
        t_in = jnp.concatenate([t] * 2)

        big_x, big_t, big_ctx = [], [], []
        c_crossattn = embeddings["c_crossattn"]                      # [K,1,ctx]
        c_concat = embeddings["c_concat"]                            # [K,ls,ls,4]
        for kref in range(K):
            p = polar + ref_polars[0] - ref_polars[kref]
            a = azimuth + ref_azimuths[0] - ref_azimuths[kref]
            r = radius + ref_radii[0] - ref_radii[kref]
            T = self._camera_T(p, a, r)                              # [B,1,4]
            clip_emb = jnp.einsum(
                "bld,dc->blc",
                jnp.concatenate(
                    [jnp.tile(c_crossattn[kref][None], (B, 1, 1)), T],
                    axis=-1), cc_k) + cc_b                           # [B,1,ctx]
            ctx = jnp.concatenate([jnp.zeros_like(clip_emb), clip_emb])
            cc = jnp.tile(c_concat[kref][None], (B, 1, 1, 1))
            concat = jnp.concatenate([jnp.zeros_like(cc), cc])       # [2B,...]
            big_x.append(jnp.concatenate([x_in, concat], axis=-1))
            big_t.append(t_in)
            big_ctx.append(ctx)

        eps = self.unet.apply(
            {"params": params["unet"]},
            jnp.concatenate(big_x), jnp.concatenate(big_t),
            jnp.concatenate(big_ctx))                                # [K*2B,...]
        eps = eps.reshape(K, 2 * B, *eps.shape[1:])
        e_uncond, e_cond = eps[:, :B], eps[:, B:]
        guided = e_uncond + guidance_scale * (e_cond - e_uncond)     # [K,B,...]
        wsT = ws.T[:, :, None, None, None]                           # [K,B,1,1,1]
        noise_pred = jnp.sum(wsT * guided, axis=0) / jnp.sum(
            ws, axis=-1)[:, None, None, None]

        w = 1.0 - jnp.asarray(self.schedule.alphas_cumprod)[t]
        grad = (grad_scale * w)[:, None, None, None] * (noise_pred - noise)
        grad = jnp.nan_to_num(grad)
        targets = jax.lax.stop_gradient(latents - grad)
        return 0.5 * jnp.sum((latents.astype(jnp.float32) - targets) ** 2) / B

    # ------------------------------------------------------------------
    def guidance_eval(self, params, key, embeddings, pred_rgb,
                      polar, azimuth, radius, guidance_scale: float = 5.0):
        """Debug snapshot for --save_guidance (the reference's
        save_guidance path covers zero123 as well, nerf/utils.py:1028-1048):
        (noisy render, one-step denoised x0) decoded to rgb, conditioned on
        the FIRST reference view."""
        cfg = self.cfg
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        B = pred_rgb.shape[0]
        ls = cfg.latent_size if not cfg.tiny else 8
        ims = ls * self.vae.cfg.downscale
        rgb = resize_bilinear(pred_rgb[..., :3], (ims, ims))
        latents = self.encode_imgs(params, k_enc, rgb)
        t = jax.random.randint(k_t, (B,), cfg.min_step, cfg.max_step + 1)
        noise = jax.random.normal(k_noise, latents.shape)
        latents_noisy = self.schedule.add_noise(latents, noise, t)

        cc_k = params["cc_projection"]["kernel"]
        cc_b = params["cc_projection"]["bias"]
        # polar/azimuth/radius are deltas wrt the default (first-ref) view,
        # exactly the K=1 conditioning in sds_loss
        T = self._camera_T(polar, azimuth, radius)
        clip_emb = jnp.einsum(
            "bld,dc->blc",
            jnp.concatenate(
                [jnp.tile(embeddings["c_crossattn"][0][None], (B, 1, 1)), T],
                axis=-1), cc_k) + cc_b
        ctx = jnp.concatenate([jnp.zeros_like(clip_emb), clip_emb])
        cc = jnp.tile(embeddings["c_concat"][0][None], (B, 1, 1, 1))
        concat = jnp.concatenate([jnp.zeros_like(cc), cc])
        x_in = jnp.concatenate([latents_noisy] * 2)
        x_in = jnp.concatenate([x_in, concat], axis=-1)
        t_in = jnp.concatenate([t] * 2)
        eps = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
        e_u, e_c = jnp.split(eps, 2)
        noise_pred = e_u + guidance_scale * (e_c - e_u)
        x0 = self.schedule.predict_start_from_noise(latents_noisy, t,
                                                    noise_pred)
        return (self.decode_latents(params, latents_noisy),
                self.decode_latents(params, x0))

    # ------------------------------------------------------------------
    def novel_view(self, params, key, embeddings, polar, azimuth, radius,
                   num_inference_steps: int = 50, guidance_scale: float = 3.0):
        """Standalone novel-view synthesis (zero123_utils.py:234-270)."""
        cfg = self.cfg
        B = polar.shape[0]
        ls = cfg.latent_size if not cfg.tiny else 8
        key, k0 = jax.random.split(key)
        latents = jax.random.normal(k0, (B, ls, ls, 4))

        cc_k = params["cc_projection"]["kernel"]
        cc_b = params["cc_projection"]["bias"]
        T = self._camera_T(polar, azimuth, radius)
        c_crossattn = embeddings["c_crossattn"][0]
        clip_emb = jnp.einsum(
            "bld,dc->blc",
            jnp.concatenate([jnp.tile(c_crossattn[None], (B, 1, 1)), T],
                            axis=-1), cc_k) + cc_b
        ctx = jnp.concatenate([jnp.zeros_like(clip_emb), clip_emb])
        cc = jnp.tile(embeddings["c_concat"][0][None], (B, 1, 1, 1))
        concat = jnp.concatenate([jnp.zeros_like(cc), cc])

        Tt = cfg.num_train_timesteps
        stepsize = Tt // num_inference_steps
        timesteps = list(range(Tt - 1, -1, -stepsize))[:num_inference_steps]
        for i, tcur in enumerate(timesteps):
            t_prev = timesteps[i + 1] if i + 1 < len(timesteps) else -1
            x_in = jnp.concatenate([latents] * 2)
            t_in = jnp.full((2 * B,), tcur)
            eps = self.unet.apply(
                {"params": params["unet"]},
                jnp.concatenate([x_in, concat], axis=-1), t_in, ctx)
            e_u, e_c = jnp.split(eps, 2)
            eps_g = e_u + guidance_scale * (e_c - e_u)
            latents = self.schedule.ddim_step(
                latents, eps_g, jnp.full((B,), tcur), jnp.full((B,), t_prev))
        return self.decode_latents(params, latents)


def _main(argv=None):
    """Standalone novel-view synthesis sanity CLI (reference
    zero123_utils.py:288-320): python -m dreamfusion_tpu.guidance.zero123
    --image x_rgba.png --polar -20 --azimuth 40 [--weights dir]"""
    import argparse
    import os

    ap = argparse.ArgumentParser("zero123 novel view")
    ap.add_argument("--image", required=True)
    ap.add_argument("--polar", type=float, default=0.0,
                    help="delta polar vs the reference view (deg)")
    ap.add_argument("--azimuth", type=float, default=30.0)
    ap.add_argument("--radius", type=float, default=0.0)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="zero123_sample.png")
    args = ap.parse_args(argv)

    from ..utils.platform import honor_cpu_env
    honor_cpu_env()

    from PIL import Image

    from ..utils.image import save_image

    g = Zero123Guidance(Zero123Config(tiny=args.tiny))
    params = g.load_pretrained(args.weights) if args.weights else \
        g.init_params(jax.random.PRNGKey(args.seed))
    rgba = np.asarray(Image.open(args.image).convert("RGBA"),
                      np.float32) / 255.0
    rgb = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])  # white bg
    emb = g.prepare_image_embeddings(params, rgb[None])
    img = g.novel_view(params, jax.random.PRNGKey(args.seed), emb,
                       jnp.asarray([args.polar]), jnp.asarray([args.azimuth]),
                       jnp.asarray([args.radius]),
                       num_inference_steps=args.steps,
                       guidance_scale=args.scale)
    save_image(args.out, np.asarray(img[0]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    _main()
