"""Ray-interval math and hierarchical importance sampling.

Reference semantics: nerf/renderer.py:19-79 (`sample_pdf`,
`near_far_from_bound`).  Rewritten vectorized for XLA: the CDF inversion
uses `jnp.searchsorted` (lowered to a fused binary search) and everything
is static-shape.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def near_far_from_bound(
    rays_o: jax.Array,            # [..., 3]
    rays_d: jax.Array,            # [..., 3]
    bound: float,
    kind: str = "cube",
    min_near: float = 0.05,
) -> Tuple[jax.Array, jax.Array]:
    """Ray/AABB (or sphere) entry-exit distances; [..., 1] each.

    Non-intersecting rays get near=far=1e9 (reference renderer.py:55-79).
    """
    if kind == "sphere":
        radius = jnp.linalg.norm(rays_o, axis=-1, keepdims=True)
        return radius - bound, radius + bound

    inv_d = 1.0 / (rays_d + 1e-15)
    tmin = (-bound - rays_o) * inv_d
    tmax = (bound - rays_o) * inv_d
    near = jnp.max(jnp.minimum(tmin, tmax), axis=-1, keepdims=True)
    far = jnp.min(jnp.maximum(tmin, tmax), axis=-1, keepdims=True)
    miss = far < near
    near = jnp.where(miss, 1e9, near)
    far = jnp.where(miss, 1e9, far)
    near = jnp.maximum(near, min_near)
    return near, far


def sample_pdf(
    key: Optional[jax.Array],
    bins: jax.Array,        # [B, T]   bin edges (z values)
    weights: jax.Array,     # [B, T-1] bin weights
    n_samples: int,
    det: bool = False,
) -> jax.Array:
    """Inverse-CDF sampling of `n_samples` new z values per ray
    (reference nerf/renderer.py:19-53). Returns [B, n_samples]."""
    B, T = bins.shape
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, T]

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (B, n_samples))
    else:
        # stratified (jittered) draws: one sample per 1/n stratum — lower
        # variance than iid uniform AND monotone in the sample index, so
        # the inverse-CDF output is already sorted (callers need no sort)
        assert key is not None
        u = (jnp.arange(n_samples) +
             jax.random.uniform(key, (B, n_samples))) / n_samples

    # dense rank instead of searchsorted: one [B, n, T] compare+sum keeps
    # the VPU busy; vmapped binary search lowers to serial while-loops on
    # TPU (measured as the dominant cost of the ray march)
    inds = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1).astype(jnp.int32)
    # cdf[0] == 0 <= u always, so inds >= 1: below = inds-1, above =
    # min(inds, T-1) = min(below+1, T-1).  Fetch both via ONE one-hot and
    # two MXU einsums over stacked (cdf, bins) — per-row take_along_axis
    # gathers are row-latency-bound on TPU
    below = inds - 1
    onehot = (below[..., None] ==
              jnp.arange(T, dtype=jnp.int32)).astype(bins.dtype)  # [B,n,T]
    vals = jnp.stack([cdf, bins], axis=-1)                        # [B,T,2]
    vals_hi = jnp.concatenate([vals[:, 1:], vals[:, -1:]], axis=1)
    lo = jnp.einsum("bnt,btc->bnc", onehot, vals)
    hi = jnp.einsum("bnt,btc->bnc", onehot, vals_hi)
    cdf_lo, bin_lo = lo[..., 0], lo[..., 1]
    cdf_hi, bin_hi = hi[..., 0], hi[..., 1]

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_lo) / denom
    return bin_lo + t * (bin_hi - bin_lo)


def stratified_zs(
    key: Optional[jax.Array],
    near: jax.Array,       # [R, 1]
    far: jax.Array,        # [R, 1]
    n_steps: int,
    perturb: bool = False,
) -> jax.Array:
    """Uniform (optionally jittered) samples in [near, far]; [R, n_steps].

    Matches the vanilla path's init + perturb (reference renderer.py:600-610):
    jitter is +/- half a step, and samples may exceed [near, far] slightly.
    """
    R = near.shape[0]
    z = jnp.linspace(0.0, 1.0, n_steps)[None, :]             # [1, S]
    z = near + (far - near) * z                               # [R, S]
    step = (far - near) / n_steps                             # [R, 1]
    if perturb:
        assert key is not None
        z = z + (jax.random.uniform(key, (R, n_steps)) - 0.5) * step
    return z
