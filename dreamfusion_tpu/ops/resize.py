"""Bilinear resize as two interpolation matmuls (MXU-native).

`jax.image.resize(method="bilinear")` lowers to per-output-row gathers on
this backend, and its BACKWARD is a scatter-add — both row-latency-bound
(CLAUDE.md gotcha 3).  Separable bilinear interpolation is exactly
`A_h @ x @ A_w^T` with static [out, in] weight matrices: forward and
backward are plain matmuls.  Matches jax.image.resize's half-pixel
convention to float tolerance (oracle test in tests/test_resize.py).

Used by the SDS guidance paths (64^2 render -> 512^2 VAE input, with
gradient flowing back through the resize every step)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _interp_matrix(n_out: int, n_in: int, antialias: bool = True):
    """[n_out, n_in] triangle-kernel weights, half-pixel centers, rows
    normalized — matches jax.image.resize's bilinear INCLUDING the
    anti-aliased (kernel widened by the scale factor) minification case.
    `antialias=False` keeps the 2-tap kernel on minification — torch
    F.interpolate(mode='bilinear', align_corners=False) semantics."""
    import numpy as np
    inv_scale = n_in / n_out
    kw = max(1.0, inv_scale) if antialias else 1.0   # half-width, input px
    src = (np.arange(n_out) + 0.5) * inv_scale - 0.5       # [n_out]
    d = (np.arange(n_in)[None, :] - src[:, None]) / kw     # [n_out, n_in]
    m = np.clip(1.0 - np.abs(d), 0.0, None).astype(np.float32)
    m /= m.sum(axis=1, keepdims=True)
    # return NUMPY (not jnp): a jnp array created during a jit trace would
    # be cached as that trace's tracer and leak into later traces
    return m


@functools.lru_cache(maxsize=32)
def _interp_matrix_ac(n_out: int, n_in: int):
    """[n_out, n_in] bilinear weights with the align_corners=True grid
    (out i samples input at i·(n_in−1)/(n_out−1)) — torch
    F.interpolate(align_corners=True) semantics, used by the DPT fusion
    blocks.  No anti-aliasing (DPT only ever upsamples ×2)."""
    import numpy as np
    if n_out == 1 or n_in == 1:
        return np.full((n_out, n_in), 1.0 / n_in, dtype=np.float32)
    src = np.arange(n_out) * ((n_in - 1) / (n_out - 1))       # [n_out]
    d = np.arange(n_in)[None, :] - src[:, None]               # [n_out, n_in]
    m = np.clip(1.0 - np.abs(d), 0.0, None).astype(np.float32)
    m /= m.sum(axis=1, keepdims=True)
    return m


def resize_bilinear(x: jax.Array, out_hw, align_corners: bool = False,
                    antialias: bool = True) -> jax.Array:
    """x [B, H, W, C] → [B, out_h, out_w, C]; differentiable (matmul vjp)."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    if (oh, ow) == (H, W):
        return x
    if align_corners:
        ah, aw = _interp_matrix_ac(oh, H), _interp_matrix_ac(ow, W)
    else:
        ah = _interp_matrix(oh, H, antialias)
        aw = _interp_matrix(ow, W, antialias)
    ah, aw = jnp.asarray(ah), jnp.asarray(aw)
    y = jnp.einsum("oh,bhwc->bowc", ah, x.astype(jnp.float32))
    y = jnp.einsum("pw,bowc->bopc", aw, y)
    return y.astype(x.dtype)
