"""Synthetic camera batch generation.

TPU-native redesign of /root/reference/nerf/provider.py's `NeRFDataset`:
instead of a torch DataLoader whose collate_fn builds poses on the GPU
(provider.py:248-320), batch synthesis is a *pure function of a PRNG key*
that traces into the jitted train step — there is no host dataloader, no
host→device transfer, and the "dataset" is just `range(size)` epochs for
bookkeeping (exactly what the reference's loader iterates over anyway).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core.poses import circle_poses, rand_poses
from ..core.rays import get_rays, intrinsics_from_fov, mvp_from_pose, projection_matrix

FAR = 1000.0


class CameraBatch(NamedTuple):
    rays_o: jax.Array        # [B, H*W, 3]
    rays_d: jax.Array        # [B, H*W, 3]
    mvp: jax.Array           # [B, 4, 4]
    dirs: jax.Array          # [B] int32 view bins
    delta_polar: jax.Array   # [B]
    delta_azimuth: jax.Array # [B] in [-180, 180]
    delta_radius: jax.Array  # [B]


def sample_train_batch(
    key: jax.Array, cfg: Config, H: int, W: int,
    radius_range=None, theta_range=None, phi_range=None, fovy_range=None,
) -> CameraBatch:
    """Random training views (provider.py:252-258, 281-314). Range args may
    be traced (progressive view)."""
    radius_range = radius_range or cfg.radius_range
    theta_range = theta_range or cfg.theta_range
    phi_range = phi_range or cfg.phi_range
    fovy_range = fovy_range or cfg.fovy_range

    k_pose, k_fov = jax.random.split(key)
    pb = rand_poses(
        k_pose, cfg.batch_size,
        radius_range=radius_range, theta_range=theta_range,
        phi_range=phi_range,
        angle_overhead=cfg.angle_overhead, angle_front=cfg.angle_front,
        uniform_sphere_rate=cfg.uniform_sphere_rate,
        jitter_pose=cfg.jitter_pose, jitter_center=cfg.jitter_center,
        jitter_target=cfg.jitter_target, jitter_up=cfg.jitter_up,
    )
    fov = jax.random.uniform(
        k_fov, (), minval=jnp.asarray(fovy_range[0], jnp.float32),
        maxval=jnp.asarray(fovy_range[1], jnp.float32))
    return _batch_from_poses(cfg, pb.poses, pb.dirs, pb.thetas, pb.phis,
                             pb.radius, fov, H, W)


def _batch_from_poses(cfg, poses, dirs, thetas, phis, radius, fov, H, W):
    intr = intrinsics_from_fov(fov, H, W)
    focal = intr[0]
    proj = projection_matrix(focal, H, W, cfg.min_near, FAR)
    mvp = mvp_from_pose(poses, proj)
    rays_o, rays_d = get_rays(poses, intr, H, W)

    delta_polar = thetas - cfg.default_polar
    delta_azimuth = phis - cfg.default_azimuth
    delta_azimuth = jnp.where(delta_azimuth > 180, delta_azimuth - 360,
                              delta_azimuth)
    delta_radius = radius - cfg.default_radius
    return CameraBatch(rays_o, rays_d, mvp, dirs, delta_polar, delta_azimuth,
                       delta_radius)


def circle_view_batch(cfg: Config, index: int, size: int, H: int, W: int
                      ) -> CameraBatch:
    """Deterministic turntable view for eval/test (provider.py:271-283)."""
    phi = (index / size) * 360.0
    poses, dirs = circle_poses(
        jnp.array([cfg.default_radius]), jnp.array([cfg.default_polar]),
        jnp.array([phi], jnp.float32),
        angle_overhead=cfg.angle_overhead, angle_front=cfg.angle_front)
    return _batch_from_poses(
        cfg, poses, dirs,
        jnp.array([cfg.default_polar]), jnp.array([phi], jnp.float32),
        jnp.array([cfg.default_radius]), jnp.asarray(cfg.default_fovy), H, W)


SIX_VIEW_THETAS = (90.0, 90.0, 90.0, 90.0, 1e-3, 179.999)
SIX_VIEW_PHIS = (0.0, 90.0, 180.0, -90.0, 0.0, 0.0)


def six_view_batch(cfg: Config, index: int, H: int, W: int) -> CameraBatch:
    """Axis-aligned views (provider.py:259-269)."""
    poses, dirs = circle_poses(
        jnp.array([cfg.default_radius]),
        jnp.array([SIX_VIEW_THETAS[index]]),
        jnp.array([SIX_VIEW_PHIS[index]]),
        angle_overhead=cfg.angle_overhead, angle_front=cfg.angle_front)
    return _batch_from_poses(
        cfg, poses, dirs, jnp.array([SIX_VIEW_THETAS[index]]),
        jnp.array([SIX_VIEW_PHIS[index]]),
        jnp.array([cfg.default_radius]), jnp.asarray(cfg.default_fovy), H, W)


def default_view_batch(cfg: Config, ref_radii, ref_polars, ref_azimuths,
                       H: int, W: int) -> CameraBatch:
    """Known-view cameras for image-conditioned training
    (provider.py:207-246); rendered at known_view_scale resolution."""
    Hs = int(cfg.known_view_scale * H)
    Ws = int(cfg.known_view_scale * W)
    radii = jnp.asarray(ref_radii, jnp.float32)
    thetas = jnp.asarray(ref_polars, jnp.float32)
    phis = jnp.asarray(ref_azimuths, jnp.float32)
    poses, dirs = circle_poses(
        radii, thetas, phis, angle_overhead=cfg.angle_overhead,
        angle_front=cfg.angle_front)
    return _batch_from_poses(cfg, poses, dirs, thetas, phis, radii,
                             jnp.asarray(cfg.default_fovy), Hs, Ws)
