"""Occupancy (density) grid: query, update, and TPU-native ray marching.

This replaces the `raymarching` CUDA extension's occupancy machinery
(/root/reference/raymarching/src/raymarching.cu:338-475 `kernel_march_rays_train`
and the grid maintenance in /root/reference/nerf/renderer.py:1102-1149).

The CUDA design is inherently dynamic: every ray walks voxels one at a time,
skipping empty space, and an atomic counter allocates the exact number of
surviving samples (M = counter.item() — a GPU→CPU sync the reference itself
pays every step, raymarching/raymarching.py:245).  XLA requires static
shapes, so we redesign rather than translate:

  1. *probe*: S0 cheap, uniformly spaced occupancy lookups per ray
     (pure gather on the [cascade, G, G, G] bool grid — no MLP);
  2. *resample*: the boolean probe profile becomes a piecewise-constant PDF
     and `sample_pdf` places the S network samples inside occupied
     intervals (inverse-CDF, same machinery as the vanilla upsample pass).

This concentrates MLP evaluations in occupied space exactly like empty-space
skipping, but with fixed [R, S] shapes that keep the MXU busy.  A `mask`
mode (zero out unoccupied samples, no resampling) is also provided.

Grid maintenance matches the reference: per-cascade 128^3 density queries at
jittered cell centers, EMA-max decay 0.95, threshold min(mean_density,
density_thresh) — all inside jit (the reference runs it in no_grad chunks).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.sampling import sample_pdf


def mip_from_pos(xyz: jax.Array, cascade: int) -> jax.Array:
    """Smallest cascade whose [-2^c, 2^c] box contains the point
    (reference raymarching.cu mip_from_pos). Returns int32 [N]."""
    mx = jnp.max(jnp.abs(xyz), axis=-1)
    # exponent such that 2^c >= mx  →  c = ceil(log2(mx)) for mx > 1 else 0
    c = jnp.ceil(jnp.log2(jnp.maximum(mx, 1e-8)))
    return jnp.clip(c, 0, cascade - 1).astype(jnp.int32)


def occupancy_lookup(
    occ_grid: jax.Array,   # [cascade, G, G, G] bool
    xyz: jax.Array,        # [..., 3]
    bound: float,
) -> jax.Array:
    """Query the multi-cascade occupancy grid at world positions → bool [...]."""
    cascade, G = occ_grid.shape[0], occ_grid.shape[1]
    mip = mip_from_pos(xyz, cascade)
    mip_bound = jnp.minimum(jnp.exp2(mip.astype(jnp.float32)), bound)[..., None]
    # world [-mb, mb] → cell [0, G)
    cell = jnp.floor((xyz / mip_bound * 0.5 + 0.5) * G).astype(jnp.int32)
    cell = jnp.clip(cell, 0, G - 1)
    inside = jnp.all(jnp.abs(xyz) <= bound, axis=-1)
    occ = occ_grid[mip, cell[..., 0], cell[..., 1], cell[..., 2]]
    return occ & inside


class MarchOut(NamedTuple):
    z_vals: jax.Array    # [R, S] sample distances along each ray
    deltas: jax.Array    # [R, S]
    mask: jax.Array      # [R, S] bool — False for padded / empty samples


def march_rays_occupancy(
    key: Optional[jax.Array],
    rays_o: jax.Array,      # [R, 3]
    rays_d: jax.Array,      # [R, 3]
    near: jax.Array,        # [R, 1]
    far: jax.Array,         # [R, 1]
    occ_grid: jax.Array,    # [cascade, G, G, G] bool
    bound: float,
    n_probe: int = 128,
    n_fine: int = 128,
    perturb: bool = False,
    mode: str = "resample",   # resample | mask
    dt_gamma: float = 0.0,
) -> MarchOut:
    """Occupancy-guided static-shape ray marching (see module docstring).

    dt_gamma > 0 spaces the probe intervals geometrically (step growth
    factor 1+dt_gamma), mirroring the reference's cone stepping for
    unbounded scenes (raymarching.cu:402-417, --dt_gamma)."""
    R = rays_o.shape[0]
    # probe at interval midpoints
    if dt_gamma > 0:
        g = 1.0 + dt_gamma
        w = g ** jnp.arange(n_probe + 1) - 1.0
        edges = w / w[-1]
        edges = edges.at[0].set(0.0)
    else:
        edges = jnp.linspace(0.0, 1.0, n_probe + 1)
    z_edges = near + (far - near) * edges[None, :]               # [R, S0+1]
    z_mid = 0.5 * (z_edges[:, 1:] + z_edges[:, :-1])             # [R, S0]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_mid[..., None]
    occ = occupancy_lookup(occ_grid, pts, bound)                 # [R, S0] bool

    if mode == "mask":
        deltas = z_edges[:, 1:] - z_edges[:, :-1]
        return MarchOut(z_mid, deltas, occ)

    # piecewise-constant PDF over probe intervals; tiny floor keeps rays with
    # no occupied voxels well-defined (their weights_sum will be ~0 anyway)
    pdf_w = occ.astype(jnp.float32) + 1e-3
    any_occ = jnp.any(occ, axis=-1, keepdims=True)
    # sample_pdf draws are monotone in sample index (det: linspace;
    # perturb: stratified) — already sorted, no sort needed
    z = sample_pdf(key, z_edges, pdf_w, n_fine, det=not perturb)  # [R, S]
    deltas = jnp.diff(z, axis=-1)
    mean_dt = (far - near) / n_fine
    deltas = jnp.concatenate([deltas, mean_dt], axis=-1)
    # sample validity = occupancy of the probe interval each draw landed in
    # (a dense rank over the same edges the PDF used) — consistent with the
    # resampling distribution and saves a second 3-D grid lookup
    rank = jnp.sum(z_edges[:, None, :] <= z[..., None], axis=-1)   # [R, S]
    interval = jnp.clip(rank - 1, 0, n_probe - 1)
    onehot = (interval[..., None] ==
              jnp.arange(n_probe)).astype(jnp.float32)             # [R,S,P]
    sample_occ = jnp.einsum("rsp,rp->rs", onehot,
                            occ.astype(jnp.float32)) > 0.5
    return MarchOut(z, deltas, sample_occ & any_occ)


# ---------------------------------------------------------------------------
# Density-grid maintenance (reference nerf/renderer.py:1102-1149)
# ---------------------------------------------------------------------------

# finite ceiling for grid cells; trunc_exp's grad clamp caps useful sigma at
# e^15 ≈ 3.3e6, so 1e7 never binds on a healthy field
_DENSITY_CAP = 1e7

def grid_cell_centers(grid_size: int) -> jax.Array:
    """[G^3, 3] cell-center coords in [-1, 1] raster order."""
    ax = (2.0 * jnp.arange(grid_size, dtype=jnp.float32) / (grid_size - 1)) - 1.0
    x, y, z = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.stack([x.ravel(), y.ravel(), z.ravel()], axis=-1)


def update_density_grid(
    key: jax.Array,
    density_grid: jax.Array,   # [cascade, G^3] fp32, -1 marks untrainable cells
    density_fn,                # xyz [N,3] → sigma [N]
    bound: float,
    decay: float = 0.95,
    density_thresh: float = 10.0,
    grid_size: int = 128,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One EMA-max update. Returns (new_grid, mean_density, occ_bool_grid).

    occ_bool_grid is [cascade, G, G, G] ready for `occupancy_lookup`.
    """
    cascade = density_grid.shape[0]
    G = grid_size
    base = grid_cell_centers(G)                                   # [G^3, 3]
    keys = jax.random.split(key, cascade)

    # chunk the G^3 query (reference renderer.py:1113 queries 64^3 blocks):
    # one dense G^3 encoder gather is multi-GB of padded HLO temps
    n_cells = G ** 3
    chunk = min(n_cells, 64 ** 3)
    n_chunks = -(-n_cells // chunk)
    pad = n_chunks * chunk - n_cells

    new_rows = []
    for cas in range(cascade):
        cas_bound = min(2 ** cas, bound)
        half_cell = cas_bound / G
        xyz = base * (cas_bound - half_cell)
        jitter = (jax.random.uniform(keys[cas], xyz.shape) * 2.0 - 1.0) * half_cell
        pts = xyz + jitter
        if pad:
            pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)])
        sigmas = jax.lax.map(density_fn,
                             pts.reshape(n_chunks, chunk, 3)).reshape(-1)
        new_rows.append(sigmas[:n_cells])
    tmp = jnp.stack(new_rows, axis=0)                             # [cascade, G^3]

    # Sanitize: one divergent step producing inf/nan sigma must not poison
    # the grid forever — EMA-max can never decay an inf away (inf*0.95=inf),
    # which saturates occupancy and kills empty-space skipping (observed in
    # the round-3 flagship run: mean_density=inf for all 10k steps).  The
    # cap is far above any useful density (trunc_exp clamps at e^15≈3.3e6)
    # so it never binds on healthy fields.  Applied to BOTH the fresh
    # queries and the carried grid so an already-poisoned grid recovers.
    cap = jnp.float32(_DENSITY_CAP)
    tmp = jnp.clip(jnp.nan_to_num(tmp, nan=0.0, posinf=_DENSITY_CAP,
                                  neginf=0.0), 0.0, cap)
    carried = jnp.clip(jnp.nan_to_num(density_grid, nan=0.0,
                                      posinf=_DENSITY_CAP, neginf=-1.0),
                       -1.0, cap)

    valid = density_grid >= 0
    updated = jnp.where(valid, jnp.maximum(carried * decay, tmp), carried)
    mean_density = jnp.sum(jnp.where(valid, updated, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )
    thresh = jnp.minimum(mean_density, density_thresh)
    occ = (updated > thresh).reshape(cascade, G, G, G)
    return updated, mean_density, occ
