"""Synthetic orbit-camera pose sampling (reference nerf/provider.py:52-180).

Pure jnp reimplementation with explicit `jax.random` keys replacing the
reference's mixture of `torch.rand` and Python `random.random()`.  Angle
conventions match the reference exactly:

  theta (polar)  : measured from +y (up); theta=90° is the equator.
  phi  (azimuth) : measured around +y, phi=0 at +z, phi=90 at +x.
  camera center  = r * (sin θ sin φ, cos θ, sin θ cos φ)
  pose           = look-at(origin) with columns (right, up, forward),
                   forward pointing *away* from the origin (OpenGL -z look).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .math import safe_normalize

# view-direction bins (reference nerf/provider.py:19-26):
# 0=front 1=side(left) 2=back 3=side(right) 4=top 5=bottom
FRONT, SIDE_L, BACK, SIDE_R, TOP, BOTTOM = 0, 1, 2, 3, 4, 5


def get_view_direction(thetas: jax.Array, phis: jax.Array,
                       overhead: float, front: float) -> jax.Array:
    """Bin each view into front/side/back/side/top/bottom
    (reference nerf/provider.py:52-70). Angles in radians."""
    phis = jnp.mod(phis, 2 * math.pi)
    res = jnp.full(thetas.shape, SIDE_R, dtype=jnp.int32)
    res = jnp.where((phis < front / 2) | (phis >= 2 * math.pi - front / 2), FRONT, res)
    res = jnp.where((phis >= front / 2) & (phis < math.pi - front / 2), SIDE_L, res)
    res = jnp.where((phis >= math.pi - front / 2) & (phis < math.pi + front / 2), BACK, res)
    res = jnp.where(thetas <= overhead, TOP, res)
    res = jnp.where(thetas >= math.pi - overhead, BOTTOM, res)
    return res


def _lookat_poses(centers: jax.Array, targets: jax.Array,
                  up_noise: jax.Array | float = 0.0) -> jax.Array:
    """Build [B,4,4] cam2world look-at poses (provider.py:130-146)."""
    B = centers.shape[0]
    forward = safe_normalize(centers - targets)
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], centers.dtype), centers.shape)
    right = safe_normalize(jnp.cross(forward, up))
    up = safe_normalize(jnp.cross(right, forward) + up_noise)
    R = jnp.stack([right, up, forward], axis=-1)     # columns
    poses = jnp.tile(jnp.eye(4, dtype=centers.dtype)[None], (B, 1, 1))
    poses = poses.at[:, :3, :3].set(R)
    poses = poses.at[:, :3, 3].set(centers)
    return poses


class PoseBatch(NamedTuple):
    poses: jax.Array       # [B, 4, 4]
    dirs: jax.Array        # [B] int32 view-direction bin
    thetas: jax.Array      # [B] degrees
    phis: jax.Array        # [B] degrees
    radius: jax.Array      # [B]


def rand_poses(
    key: jax.Array,
    size: int,
    radius_range: Tuple[float, float] = (1.0, 1.5),
    theta_range: Tuple[float, float] = (0.0, 120.0),
    phi_range: Tuple[float, float] = (0.0, 360.0),
    angle_overhead: float = 30.0,
    angle_front: float = 60.0,
    uniform_sphere_rate: float = 0.0,
    jitter_pose: bool = False,
    jitter_center: float = 0.2,
    jitter_target: float = 0.2,
    jitter_up: float = 0.02,
) -> PoseBatch:
    """Random orbit poses (reference nerf/provider.py:73-149). Angles in deg.

    Ranges may be Python floats or traced jnp scalars (the progressive-view
    schedule feeds traced ranges from inside jit)."""
    k_r, k_u, k_th, k_ph, k_sph, k_jc, k_jt, k_ju = jax.random.split(key, 8)
    th_lo, th_hi = (jnp.deg2rad(jnp.asarray(a, jnp.float32)) for a in theta_range)
    ph_lo, ph_hi = (jnp.deg2rad(jnp.asarray(a, jnp.float32)) for a in phi_range)
    overhead = math.radians(angle_overhead)
    front = math.radians(angle_front)

    radius = jax.random.uniform(
        k_r, (size,), minval=jnp.asarray(radius_range[0], jnp.float32),
        maxval=jnp.asarray(radius_range[1], jnp.float32))

    # stratified-orbit branch
    thetas_o = jax.random.uniform(k_th, (size,), minval=th_lo, maxval=th_hi)
    phis_o = jax.random.uniform(k_ph, (size,), minval=ph_lo, maxval=ph_hi)
    phis_o = jnp.where(phis_o < 0, phis_o + 2 * math.pi, phis_o)

    # uniform-upper-sphere branch (provider.py:92-104)
    g = jax.random.normal(k_sph, (size, 3))
    unit = safe_normalize(g.at[:, 1].set(jnp.abs(g[:, 1])))
    thetas_s = jnp.arccos(jnp.clip(unit[:, 1], -1.0, 1.0))
    phis_s = jnp.arctan2(unit[:, 0], unit[:, 2])
    phis_s = jnp.where(phis_s < 0, phis_s + 2 * math.pi, phis_s)

    use_sphere = jax.random.uniform(k_u, ()) < uniform_sphere_rate
    thetas = jnp.where(use_sphere, thetas_s, thetas_o)
    phis = jnp.where(use_sphere, phis_s, phis_o)

    centers = radius[:, None] * jnp.stack(
        [jnp.sin(thetas) * jnp.sin(phis), jnp.cos(thetas), jnp.sin(thetas) * jnp.cos(phis)],
        axis=-1,
    )

    targets = jnp.zeros_like(centers)
    up_noise: jax.Array | float = 0.0
    if jitter_pose:
        centers = centers + (jax.random.uniform(k_jc, centers.shape) - 0.5) * jitter_center
        targets = targets + jax.random.normal(k_jt, centers.shape) * jitter_target
        up_noise = jax.random.normal(k_ju, centers.shape) * jitter_up

    poses = _lookat_poses(centers, targets, up_noise)
    dirs = get_view_direction(thetas, phis, overhead, front)
    return PoseBatch(poses, dirs, jnp.degrees(thetas), jnp.degrees(phis), radius)


def circle_poses(
    radius: jax.Array,
    theta_deg: jax.Array,
    phi_deg: jax.Array,
    angle_overhead: float = 30.0,
    angle_front: float = 60.0,
) -> Tuple[jax.Array, jax.Array]:
    """Deterministic orbit poses (reference nerf/provider.py:152-180)."""
    theta = jnp.deg2rad(theta_deg)
    phi = jnp.deg2rad(phi_deg)
    centers = radius[:, None] * jnp.stack(
        [jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta), jnp.sin(theta) * jnp.cos(phi)],
        axis=-1,
    )
    poses = _lookat_poses(centers, jnp.zeros_like(centers))
    dirs = get_view_direction(theta, phi, math.radians(angle_overhead), math.radians(angle_front))
    return poses, dirs
