"""Pinhole ray generation (reference nerf/utils.py:113-176).

The reference uses an OpenGL-style camera: the camera looks down its local
-z axis, +x is right in image space, +y is up, so a pixel (i, j) (column,
row; pixel-center offset +0.5) maps to the unnormalized camera-space
direction ((i-cx)/fx, -(j-cy)/fy, -1).  World directions are obtained by
rotating with the cam2world rotation; ray directions are deliberately NOT
normalized before rotation (matching nerf/utils.py:160-166 — depth then
measures distance along the optical axis scaled by the pixel footprint).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pixel_grid(H: int, W: int, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Pixel-center coordinates i (column) and j (row), each [H*W]."""
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
    )
    return i.reshape(-1) + 0.5, j.reshape(-1) + 0.5


def get_rays(
    poses: jax.Array,          # [B, 4, 4] cam2world
    intrinsics: jax.Array,     # [4] = fx, fy, cx, cy
    H: int,
    W: int,
) -> Tuple[jax.Array, jax.Array]:
    """Full-image rays. Returns (rays_o, rays_d), each [B, H*W, 3]."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    i, j = pixel_grid(H, W, dtype=poses.dtype)

    xs = (i - cx) / fx
    ys = -(j - cy) / fy
    zs = -jnp.ones_like(i)
    dirs = jnp.stack([xs, ys, zs], axis=-1)          # [HW, 3] camera space

    # world = R @ cam  (row-vector form: cam_dirs @ R^T)
    rays_d = jnp.einsum("nk,bjk->bnj", dirs, poses[:, :3, :3])
    rays_o = jnp.broadcast_to(poses[:, None, :3, 3], rays_d.shape)
    return rays_o, rays_d


def intrinsics_from_fov(fovy_deg: jax.Array, H: int, W: int) -> jax.Array:
    """[fx, fy, cx, cy] from a vertical FOV in degrees
    (reference nerf/provider.py:281-283)."""
    focal = H / (2.0 * jnp.tan(jnp.deg2rad(fovy_deg) / 2.0))
    return jnp.stack([focal, focal, jnp.asarray(W / 2.0, focal.dtype),
                      jnp.asarray(H / 2.0, focal.dtype)])


def projection_matrix(focal: jax.Array, H: int, W: int,
                      near: float, far: float) -> jax.Array:
    """OpenGL clip-space projection used for the DMTet rasterization path
    (reference nerf/provider.py:285-290). Returns [4, 4]."""
    z = jnp.zeros((), dtype=jnp.float32)
    o = jnp.ones((), dtype=jnp.float32)
    return jnp.array(
        [[0.0, 0, 0, 0],
         [0, 0.0, 0, 0],
         [0, 0, -(far + near) / (far - near), -(2 * far * near) / (far - near)],
         [0, 0, -1.0, 0]],
        dtype=jnp.float32,
    ).at[0, 0].set(2 * focal / W).at[1, 1].set(-2 * focal / H)


def mvp_from_pose(poses: jax.Array, projection: jax.Array) -> jax.Array:
    """mvp = projection @ world2cam (reference nerf/provider.py:291).

    Uses the closed-form rigid inverse instead of a general 4x4 inverse.
    poses [B,4,4] cam2world, projection [4,4] or [B,4,4] → [B,4,4].
    """
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    inv_t = -jnp.einsum("bij,bj->bi", Rt, t)
    w2c = jnp.zeros_like(poses)
    w2c = w2c.at[:, :3, :3].set(Rt)
    w2c = w2c.at[:, :3, 3].set(inv_t)
    w2c = w2c.at[:, 3, 3].set(1.0)
    if projection.ndim == 2:
        projection = projection[None]
    return jnp.einsum("bij,bjk->bik", projection, w2c)
