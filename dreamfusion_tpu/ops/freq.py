"""Frequency (NeRF positional) encoding.

TPU-native equivalent of the `freqencoder` CUDA extension
(/root/reference/freqencoder/src/freqencoder.cu:30-125) and of
`FreqEncoder_torch` (/root/reference/encoding.py:5-52): sin/cos bands at
log-spaced frequencies 2^0..2^(deg-1), include-input, with optional
*progressive* level masking — instead of concatenating a zero tensor like the
reference (shape-dynamic), we zero the high bands in place (static shape,
identical values and gradients).

Layout matches FreqEncoder_torch: [x, sin(2^0 x), cos(2^0 x),
sin(2^1 x), cos(2^1 x), ...] with each band covering all input dims.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def freq_encode_dim(input_dim: int, degree: int) -> int:
    return input_dim + input_dim * 2 * degree


def freq_encode(x: jax.Array, degree: int,
                max_level: Optional[jax.Array] = None) -> jax.Array:
    """x: [..., D] → [..., D*(1+2*degree)].

    max_level: optional traced scalar in [0, 1]; bands with index
    >= ceil(max_level * degree) are zeroed (reference encoding.py:31-48).
    """
    D = x.shape[-1]
    freqs = jnp.asarray([2.0 ** i for i in range(degree)], dtype=x.dtype)
    # [..., deg, D]
    xb = x[..., None, :] * freqs[:, None]
    s, c = jnp.sin(xb), jnp.cos(xb)
    bands = jnp.concatenate([s[..., None, :], c[..., None, :]], axis=-2)  # [..., deg, 2, D]
    if max_level is not None:
        n_active = jnp.ceil(max_level * degree)
        level_idx = jnp.arange(degree, dtype=x.dtype)
        mask = (level_idx < n_active).astype(x.dtype)  # [deg]
        bands = bands * mask[:, None, None]
    bands = bands.reshape(*x.shape[:-1], degree * 2 * D)
    return jnp.concatenate([x, bands], axis=-1)
