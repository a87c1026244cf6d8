"""Transmittance compositing (volume rendering quadrature).

TPU-native equivalent of `kernel_composite_rays_train_forward/backward`
(/root/reference/raymarching/src/raymarching.cu:501-695) and of the vanilla
path's torch compositing (/root/reference/nerf/renderer.py:645-700).

The CUDA version walks each ray sequentially, multiplying transmittance and
early-stopping at T < T_thresh, with a hand-derived backward.  On TPU the
same math is a *parallel* exclusive scan: T_i = exp(-sum_{j<i} sigma_j dt_j),
computed with `jnp.cumsum` over the (static-length, padded+masked) sample
axis; gradients fall out of autodiff and match the closed form.  Early
termination becomes a mask (samples past the T_thresh horizon contribute ~0
anyway; masking reproduces the reference's hard cutoff bit-for-intent).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CompositeOut(NamedTuple):
    image: jax.Array         # [R, 3]  (pre-background)
    depth: jax.Array         # [R]
    weights: jax.Array       # [R, S]
    weights_sum: jax.Array   # [R]


def compute_deltas(z_vals: jax.Array, sample_dist: jax.Array | float) -> jax.Array:
    """Inter-sample distances with the trailing delta set to sample_dist
    (reference renderer.py:640-643)."""
    d = z_vals[..., 1:] - z_vals[..., :-1]
    last = jnp.broadcast_to(jnp.asarray(sample_dist, z_vals.dtype), d[..., :1].shape)
    return jnp.concatenate([d, last], axis=-1)


def composite_rays(
    sigmas: jax.Array,                 # [R, S]
    rgbs: jax.Array,                   # [R, S, 3]
    z_vals: jax.Array,                 # [R, S]
    deltas: jax.Array,                 # [R, S]
    mask: Optional[jax.Array] = None,  # [R, S] bool; False = padded sample
    t_thresh: float = 0.0,
    binarize: bool = False,
) -> CompositeOut:
    sdt = sigmas * deltas
    if mask is not None:
        sdt = jnp.where(mask, sdt, 0.0)

    alphas = 1.0 - jnp.exp(-sdt)                               # [R, S]
    if binarize:
        # straight-through binarization (reference raymarching.cu:544-547)
        hard = (alphas > 0.5).astype(alphas.dtype)
        alphas = alphas + jax.lax.stop_gradient(hard - alphas)

    # exclusive transmittance: T_i = exp(-cumsum_{j<i} sigma_j dt_j)
    accum = jnp.cumsum(sdt, axis=-1)
    T = jnp.exp(-(accum - sdt))                                # [R, S]
    if t_thresh > 0.0:
        T = jnp.where(T >= t_thresh, T, 0.0)

    weights = alphas * T
    if mask is not None:
        weights = jnp.where(mask, weights, 0.0)

    weights_sum = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * z_vals, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)
    return CompositeOut(image, depth, weights, weights_sum)


def apply_background(image: jax.Array, weights_sum: jax.Array,
                     bg_color: jax.Array) -> jax.Array:
    """image + (1 - acc) * bg (reference renderer.py:700-704)."""
    return image + (1.0 - weights_sum)[..., None] * bg_color
