"""3D Morton (Z-order) codes and occupancy bitfield packing.

API-parity equivalents of `kernel_morton3D`, `kernel_morton3D_invert` and
`kernel_packbits` (/root/reference/raymarching/src/raymarching.cu:214-301).

Note: the reference needs Morton ordering so that CUDA warps touching nearby
voxels hit nearby cache lines; the TPU renderer stores the occupancy grid in
plain raster order (XLA gathers don't care).  These functions exist for
checkpoint compatibility and for tests, and are pure uint32 bit-twiddling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _expand_bits(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jax.Array) -> jax.Array:
    """[N, 3] integer voxel coords (< 1024) → [N] uint32 Morton codes."""
    x = _expand_bits(coords[..., 0])
    y = _expand_bits(coords[..., 1])
    z = _expand_bits(coords[..., 2])
    return x | (y << 1) | (z << 2)


def _compact_bits(v: jax.Array) -> jax.Array:
    v = v.astype(jnp.uint32) & jnp.uint32(0x49249249)
    v = (v | (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def morton3d_invert(codes: jax.Array) -> jax.Array:
    """[N] uint32 Morton codes → [N, 3] voxel coords."""
    x = _compact_bits(codes)
    y = _compact_bits(codes >> 1)
    z = _compact_bits(codes >> 2)
    return jnp.stack([x, y, z], axis=-1)


def packbits(density_grid: jax.Array, thresh: jax.Array) -> jax.Array:
    """Pack density > thresh into a uint8 bitfield, 8 cells per byte
    (reference raymarching.cu:268-301). density_grid: [..., N] with N % 8 == 0."""
    occ = (density_grid > thresh).astype(jnp.uint8)
    occ = occ.reshape(*density_grid.shape[:-1], -1, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(occ * weights, axis=-1, dtype=jnp.uint8)


def unpackbits(bitfield: jax.Array) -> jax.Array:
    """Inverse of packbits → bool array [..., N*8]."""
    bits = (bitfield[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    return bits.reshape(*bitfield.shape[:-1], -1).astype(jnp.bool_)
