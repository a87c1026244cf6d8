"""Perp-Neg: perpendicular negative-prompt aggregation.

Reference: /root/reference/guidance/perpneg_utils.py and the view-dependent
embedding interpolation in /root/reference/nerf/utils.py:34-100.

The reference loops over the batch in Python (per-sample branching on
azimuth, `batch_get_perpendicular_component`).  Here everything is
vectorized `jnp.where` math so the whole Perp-Neg path traces into the one
jitted train step.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


def get_perpendicular_component(x: jax.Array, y: jax.Array) -> jax.Array:
    """Component of x perpendicular to y, flattening all axes
    (perpneg_utils.py:4-6). x, y: [...]."""
    dot = jnp.sum(x * y)
    ynorm2 = jnp.maximum(jnp.sum(y * y), 1e-6)
    return x - (dot / ynorm2) * y


def weighted_perpendicular_aggregator(
    delta_noise_preds: jax.Array,   # [B*K, ...] (K groups interleaved by B)
    weights: jax.Array,             # [B*K]
    batch_size: int,
) -> jax.Array:
    """Sum of weighted perpendicular components of the K-1 negative deltas
    onto the main positive delta (perpneg_utils.py:17-48). → [B, ...]."""
    B = batch_size
    K = delta_noise_preds.shape[0] // B
    d = delta_noise_preds.reshape(K, B, *delta_noise_preds.shape[1:])
    w = weights.reshape(K, B)
    main = d[0]                                               # [B, ...]

    axes = tuple(range(1, main.ndim))
    ynorm2 = jnp.maximum(jnp.sum(main * main, axis=axes), 1e-6)   # [B]
    acc = jnp.zeros_like(main)
    bshape = (B,) + (1,) * (main.ndim - 1)
    for i in range(1, K):
        x = d[i]
        dot = jnp.sum(x * main, axis=axes)                    # [B]
        perp = x - (dot / ynorm2).reshape(bshape) * main
        wi = jnp.where(jnp.abs(w[i]) > 1e-4, w[i], 0.0).reshape(bshape)
        acc = acc + wi * perp
    return acc + main


class PerpNegEmbeds(NamedTuple):
    text_z: jax.Array    # [B*K, L, D], K = 3, interleaved by batch
    weights: jax.Array   # [B*K]


def adjust_text_embeddings(
    embeddings: Dict[str, jax.Array],   # 'front'/'side'/'back': [1, L, D]
    azimuth_deg: jax.Array,             # [B] in [-180, 180]
    negative_w: float = -2.0,
    front_decay_factor: float = 2.0,
    side_decay_factor: float = 10.0,
) -> PerpNegEmbeds:
    """Vectorized equivalent of nerf/utils.py:34-100: per-view positive
    embedding interpolation plus decayed negative weights.  K is always 3
    ([pos, neg1, neg2])."""
    az = azimuth_deg
    B = az.shape[0]
    front = embeddings["front"][0]
    side = embeddings["side"][0]
    back = embeddings["back"][0]

    in_front = (az >= -90) & (az < 90)
    r_front = 1.0 - jnp.abs(az) / 90.0
    r_back = 1.0 - (jnp.abs(az) - 90.0) / 90.0
    r = jnp.where(in_front, r_front, r_back)                   # [B]

    rb = r.reshape(B, 1, 1)
    pos = jnp.where(in_front.reshape(B, 1, 1),
                    rb * front + (1 - rb) * side,
                    rb * side + (1 - rb) * back)               # [B, L, D]
    neg1 = jnp.where(in_front.reshape(B, 1, 1), front, side)
    neg2 = jnp.where(in_front.reshape(B, 1, 1), side, front)

    # weights (utils.py:73-99)
    front_w_f = jnp.where(r > 0.8, 0.0,
                          jnp.exp(-r * front_decay_factor) * negative_w)
    side_w_f = jnp.where(r < 0.2, 0.0,
                         jnp.exp(-(1 - r) * side_decay_factor) * negative_w)
    side_w_b = jnp.where(r > 0.8, 0.0,
                         jnp.exp(-r * side_decay_factor) * negative_w / 2)
    front_w_b = jnp.full_like(r, negative_w)

    w1 = jnp.where(in_front, front_w_f, side_w_b)
    w2 = jnp.where(in_front, side_w_f, front_w_b)
    ones = jnp.ones_like(r)

    text_z = jnp.concatenate([pos, neg1, neg2], axis=0)        # [3B, L, D]
    weights = jnp.concatenate([ones, w1, w2], axis=0)          # [3B]
    return PerpNegEmbeds(text_z, weights)


def interpolate_view_embedding(
    embeddings: Dict[str, jax.Array],   # 'front'/'side'/'back': [1, L, D]
    azimuth_deg: jax.Array,             # [B]
) -> jax.Array:
    """Non-perpneg view-dependent positive embedding
    (nerf/utils.py:609-624): lerp front↔side for |az|<90, side↔back else."""
    az = azimuth_deg
    B = az.shape[0]
    front = embeddings["front"][0]
    side = embeddings["side"][0]
    back = embeddings["back"][0]
    in_front = (az >= -90) & (az < 90)
    r = jnp.where(in_front, 1.0 - jnp.abs(az) / 90.0,
                  1.0 - (jnp.abs(az) - 90.0) / 90.0).reshape(B, 1, 1)
    return jnp.where(in_front.reshape(B, 1, 1),
                     r * front + (1 - r) * side,
                     r * side + (1 - r) * back)
