"""Volume renderer over a NeRF field.

TPU-native re-design of /root/reference/nerf/renderer.py's `run` (vanilla,
:560-707) and `run_cuda` (occupancy-accelerated, :710-807):

  * vanilla: fixed `num_steps` stratified samples + `upsample_steps`
    importance samples (inverse-CDF), merged and sorted — static shapes
    throughout.  Unlike the reference (which runs a density pass, merges,
    then a *second* full forward for colors), we evaluate the field once on
    the merged sample set and reuse its σ for compositing — the same
    function value, one fewer MLP+encoder pass.
  * grid: the CUDA empty-space-skipping march (raymarching.cu:338-475) is
    replaced by probe-and-resample occupancy marching
    (ops/occupancy.march_rays_occupancy) with fixed [R, S] sample buffers.
  * compositing is a parallel scan (ops/composite.py), not a sequential
    per-ray loop.
  * Eval-time ray compaction (`n_alive/n_step` chunks, renderer.py:759-794)
    is replaced by dense evaluation — on TPU, wasted masked lanes are
    cheaper than dynamic shapes.

Everything is shape-static and usable under jit/grad; per-step randomness
enters only through explicit keys.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.math import safe_normalize
from ..core.sampling import near_far_from_bound, sample_pdf, stratified_zs
from ..ops.composite import apply_background, composite_rays, compute_deltas
from ..ops.occupancy import march_rays_occupancy
from .nerf import NeRFField, SHADING_ALBEDO


@dataclass(frozen=True)
class RenderFlags:
    """Static (trace-time) rendering switches."""
    perturb: bool = False
    shading_static_albedo: bool = False   # skip normal probes entirely
    need_loss_orient: bool = False
    need_normal_perturb: bool = False
    need_normal_image: bool = False
    binarize: bool = False


class NeRFRenderer(nn.Module):
    """Field + rendering. The occupancy grid is explicit function state (a
    TrainState leaf), not a module variable — keeps the train step pure."""

    backbone: str = "grid"
    bound: float = 1.0
    min_near: float = 0.01
    bg_radius: float = 1.4
    density_act: str = "exp"
    blob_density: float = 5.0
    blob_radius: float = 0.2
    num_steps: int = 64
    upsample_steps: int = 32
    grid_probe_steps: int = 128
    grid_fine_steps: int = 128
    occupancy_mode: str = "resample"
    dt_gamma: float = 0.0
    t_thresh: float = 1e-4
    hidden_dim: int = 64
    num_layers: int = 3
    hidden_dim_bg: int = 32
    num_layers_bg: int = 2
    grid_levels: int = 16
    grid_features_per_level: int = 2
    grid_log2_hashmap_size: int = 19
    grid_desired_resolution: int = 2048
    grid_interpolation: str = "smoothstep"
    grid_hash: str = "affine"
    triplane_resolution: int = 256
    triplane_channels: int = 16
    triplane_scales: int = 2
    normal_mode: str = "autograd"
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        self.field = NeRFField(
            backbone=self.backbone,
            bound=self.bound,
            hidden_dim=self.hidden_dim,
            num_layers=self.num_layers,
            hidden_dim_bg=self.hidden_dim_bg,
            num_layers_bg=self.num_layers_bg,
            bg_radius=self.bg_radius,
            density_act=self.density_act,
            blob_density=self.blob_density,
            blob_radius=self.blob_radius,
            grid_levels=self.grid_levels,
            grid_features_per_level=self.grid_features_per_level,
            grid_log2_hashmap_size=self.grid_log2_hashmap_size,
            grid_desired_resolution=self.grid_desired_resolution,
            grid_interpolation=self.grid_interpolation,
            grid_hash=self.grid_hash,
            triplane_resolution=self.triplane_resolution,
            triplane_channels=self.triplane_channels,
            triplane_scales=self.triplane_scales,
            normal_mode=self.normal_mode,
            compute_dtype=self.compute_dtype,
            name="field",
        )

    # ---- delegates for grid maintenance / mesh export -------------------
    def density(self, x, max_level=None):
        return self.field.density(x, max_level)

    def background(self, d):
        return self.field.background(d)

    # ---- shared shading + compositing tail ------------------------------
    def _shade_and_composite(
        self, flags: RenderFlags,
        rays_o, rays_d, z_vals, deltas, mask,
        light_d, ambient_ratio, shading, max_level,
        bg_color, use_bg_net=None,
    ) -> Dict[str, jax.Array]:
        R, S = z_vals.shape
        xyzs = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        xyzs = jnp.clip(xyzs, -self.bound, self.bound)
        dirs = safe_normalize(jnp.broadcast_to(rays_d[:, None, :], xyzs.shape))
        ld = jnp.broadcast_to(light_d[:, None, :] if light_d.ndim == 2
                              else light_d, xyzs.shape)

        shading_arg = SHADING_ALBEDO if flags.shading_static_albedo else shading
        sigmas, rgbs, normals = self.field(
            xyzs.reshape(-1, 3), dirs.reshape(-1, 3), ld.reshape(-1, 3),
            ratio=ambient_ratio, shading=shading_arg, max_level=max_level,
        )
        sigmas = sigmas.reshape(R, S)
        rgbs = rgbs.reshape(R, S, 3).astype(jnp.float32)

        out = composite_rays(sigmas, rgbs, z_vals, deltas, mask=mask,
                             t_thresh=self.t_thresh, binarize=flags.binarize)
        image = out.image

        if use_bg_net is not None and self.bg_radius > 0:
            # traced per-step choice between bg MLP and a given color
            # (reference nerf/utils.py:529-534 picks one per step on the host)
            assert bg_color is not None
            bg_net_color = self.field.background(safe_normalize(rays_d))
            bg_color = jnp.where(use_bg_net, bg_net_color, bg_color)
        elif bg_color is None:
            if self.bg_radius > 0:
                bg_color = self.field.background(safe_normalize(rays_d))
            else:
                bg_color = jnp.ones((), jnp.float32)
        image = apply_background(image, out.weights_sum, bg_color)

        results: Dict[str, jax.Array] = {
            "image": image,
            "depth": out.depth,
            "weights": out.weights,
            "weights_sum": out.weights_sum,
        }

        if normals is not None:
            normals = normals.reshape(R, S, 3)
            if flags.need_loss_orient:
                # punish normals facing away from the camera
                # (reference renderer.py:686-689)
                w = jax.lax.stop_gradient(out.weights)
                loss = w * jnp.maximum(
                    jnp.sum(normals * dirs, axis=-1), 0.0) ** 2
                results["loss_orient"] = jnp.mean(jnp.sum(loss, axis=-1))
            if flags.need_normal_perturb:
                key = self.make_rng("render")
                perturbed = xyzs + jax.random.normal(key, xyzs.shape) * 1e-2
                n2 = self.field.normal(perturbed.reshape(-1, 3), max_level)
                results["loss_normal_perturb"] = jnp.mean(
                    jnp.abs(normals - n2.reshape(R, S, 3)))
            if flags.need_normal_image:
                results["normal_image"] = jnp.sum(
                    out.weights[..., None] * (normals + 1.0) / 2.0, axis=-2)
        return results

    # ---- vanilla path (reference renderer.py:560-707) --------------------
    def render_vanilla(
        self, flags: RenderFlags,
        rays_o, rays_d,                 # [R, 3]
        light_d, ambient_ratio=1.0, shading=SHADING_ALBEDO,
        bg_color=None, max_level=None, use_bg_net=None,
    ) -> Dict[str, jax.Array]:
        R = rays_o.shape[0]
        near, far = near_far_from_bound(rays_o, rays_d, self.bound,
                                        kind="sphere", min_near=self.min_near)
        k_strat = k_pdf = None
        if flags.perturb:
            k_strat, k_pdf = jax.random.split(self.make_rng("render"))

        z_vals = stratified_zs(k_strat, near, far, self.num_steps,
                               perturb=flags.perturb)            # [R, T]
        sample_dist = (far - near) / self.num_steps               # [R, 1]

        if self.upsample_steps > 0:
            # coarse density-only pass to build the importance PDF
            xyzs = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
            xyzs = jnp.clip(xyzs, -self.bound, self.bound)
            sigmas = self.field.density(
                xyzs.reshape(-1, 3), max_level)["sigma"].reshape(R, -1)
            sigmas = jax.lax.stop_gradient(sigmas)
            deltas = compute_deltas(z_vals, sample_dist)
            alphas = 1.0 - jnp.exp(-deltas * sigmas)
            T = jnp.cumprod(
                jnp.concatenate([jnp.ones_like(alphas[..., :1]),
                                 1.0 - alphas + 1e-15], axis=-1), axis=-1
            )[..., :-1]
            weights = alphas * T
            z_mid = z_vals[..., :-1] + 0.5 * deltas[..., :-1]
            new_z = sample_pdf(k_pdf, z_mid, weights[:, 1:-1],
                               self.upsample_steps, det=not flags.perturb)
            z_vals = jnp.sort(
                jnp.concatenate([z_vals, jax.lax.stop_gradient(new_z)], axis=-1),
                axis=-1)                                          # [R, T+t]

        deltas = compute_deltas(z_vals, sample_dist)
        return self._shade_and_composite(
            flags, rays_o, rays_d, z_vals, deltas, None,
            light_d, ambient_ratio, shading, max_level, bg_color, use_bg_net)

    # ---- occupancy-grid path (reference run_cuda, renderer.py:710-807) ----
    def render_grid(
        self, flags: RenderFlags,
        rays_o, rays_d,                 # [R, 3]
        occ_grid,                       # [cascade, G, G, G] bool
        light_d, ambient_ratio=1.0, shading=SHADING_ALBEDO,
        bg_color=None, max_level=None, use_bg_net=None,
    ) -> Dict[str, jax.Array]:
        near, far = near_far_from_bound(rays_o, rays_d, self.bound,
                                        kind="cube", min_near=self.min_near)
        key = self.make_rng("render") if flags.perturb else None
        march = march_rays_occupancy(
            key, rays_o, rays_d, near, far, occ_grid, self.bound,
            n_probe=self.grid_probe_steps, n_fine=self.grid_fine_steps,
            perturb=flags.perturb, mode=self.occupancy_mode,
            dt_gamma=self.dt_gamma,
        )
        return self._shade_and_composite(
            flags, rays_o, rays_d, march.z_vals, march.deltas, march.mask,
            light_d, ambient_ratio, shading, max_level, bg_color, use_bg_net)

    def render(
        self, flags: RenderFlags,
        rays_o, rays_d,
        occ_grid=None,
        light_d=None, ambient_ratio=1.0, shading=SHADING_ALBEDO,
        bg_color=None, max_level=None, use_bg_net=None,
    ) -> Dict[str, jax.Array]:
        """Dispatch (reference renderer.py:1154-1186). rays [R, 3] flat."""
        if light_d is None:
            light_d = safe_normalize(rays_o)
        if self.backbone in ("grid", "triplane") and occ_grid is not None:
            return self.render_grid(flags, rays_o, rays_d, occ_grid, light_d,
                                    ambient_ratio, shading, bg_color, max_level,
                                    use_bg_net)
        return self.render_vanilla(flags, rays_o, rays_d, light_d,
                                   ambient_ratio, shading, bg_color, max_level,
                                   use_bg_net)
