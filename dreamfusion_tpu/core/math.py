"""Small pure math helpers (reference: nerf/utils.py:109-199).

All functions are jnp-pure, shape-polymorphic, and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_normalize(x: jax.Array, eps: float = 1e-20) -> jax.Array:
    """L2-normalize along the last axis with a clamped denominator
    (reference nerf/utils.py:109-110)."""
    n2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(n2, eps))


def linear_to_srgb(x: jax.Array) -> jax.Array:
    """Reference nerf/utils.py:188-190."""
    x = jnp.maximum(x, 0.0)
    return jnp.where(x < 0.0031308, 12.92 * x, 1.055 * jnp.power(x, 0.41666) - 0.055)


def srgb_to_linear(x: jax.Array) -> jax.Array:
    """Reference nerf/utils.py:193-195."""
    x = jnp.maximum(x, 0.0)
    return jnp.where(x < 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


def lerp(a, b, t):
    return a + (b - a) * t


def uniform(key, shape=(), lo=0.0, hi=1.0, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype=dtype, minval=lo, maxval=hi)


def clip_grad(x: jax.Array, limit: float) -> jax.Array:
    """Identity whose COTANGENT is clamped elementwise to [-limit, limit]
    (reference --grad_clip_rgb, nerf/utils.py:1052-1063 — a backward hook
    on the rendered rgb that clips the guidance gradient entering the
    renderer; bf16 end-to-end here, so no amp-scale factor)."""

    @jax.custom_vjp
    def _ident(v):
        return v

    def _fwd(v):
        return v, None

    def _bwd(_, g):
        return (jnp.clip(g, -limit, limit),)

    _ident.defvjp(_fwd, _bwd)
    return _ident(x)
