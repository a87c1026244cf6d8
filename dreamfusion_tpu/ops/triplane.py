"""Multi-scale triplane feature encoder — the TPU-first alternative to the
Instant-NGP hash grid.

Rationale (measured on the target TPU, see bench notes in ops/conv.py):
gathers/scatters are *row-latency-bound* (~6.5 ns gathered row, ~60 ns
scattered row, independent of row width).  The hash grid needs
L·8 = 128 gathered rows per sample forward and 128 scattered rows per
sample backward; a triplane needs 3 planes × 4 bilinear corners × S scales
= 12·S rows — ~5-10× fewer, with dense, collision-friendly tables.
Triplane/TensoRF-style factorizations are established equal-quality
encodings for object-centric NeRFs (EG3D, TensoRF), which is exactly the
DreamFusion workload (single object in [-bound, bound]³).

API mirrors ops/hashgrid.py (encode + spec + init + progressive
`max_level` masking) so NeRFField can switch backbones symmetrically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

# plane axis pairs: xy, xz, yz (EG3D convention)
_PLANE_AXES = ((0, 1), (0, 2), (1, 2))


@dataclass(frozen=True)
class TriplaneSpec:
    resolution: int = 256        # finest plane resolution
    channels: int = 16           # features per plane
    num_scales: int = 2          # finest + halved resolutions
    reduce: str = "concat"       # concat | sum over planes

    @property
    def resolutions(self) -> Tuple[int, ...]:
        return tuple(max(16, self.resolution // (2 ** s))
                     for s in range(self.num_scales))

    @property
    def output_dim(self) -> int:
        per_scale = 3 * self.channels if self.reduce == "concat" \
            else self.channels
        return per_scale * self.num_scales


def init_triplane(key: jax.Array, spec: TriplaneSpec, scale: float = 1e-1
                  ) -> List[jax.Array]:
    """List of [3, R_s, R_s, C] fp32 (one per scale)."""
    keys = jax.random.split(key, spec.num_scales)
    return [jax.random.normal(k, (3, r, r, spec.channels)) * scale
            for k, r in zip(keys, spec.resolutions)]


def _quad_pack(planes: jax.Array) -> jax.Array:
    """[3, R, R, C] → [3, R, R, 4C]: row (y, x) holds the 2×2 bilinear
    corner block [(y,x), (y,x+1), (y+1,x), (y+1,x+1)], edge-clamped.

    Gathers on this backend are *row-latency-bound* (~6.5 ns gathered /
    ~60 ns scattered row, independent of width up to the 128-lane pad —
    CLAUDE.md gotcha #3).  Packing the four corners into one ≤128-lane row
    turns 4 gathered rows per (sample, plane) into 1, and — decisively —
    the backward scatter-add from 4 rows into 1; the pack itself and its
    adjoint (four shifted dense adds) are cheap dense ops XLA fuses."""
    px = jnp.concatenate([planes[:, :, 1:], planes[:, :, -1:]], axis=2)
    py = jnp.concatenate([planes[:, 1:], planes[:, -1:]], axis=1)
    pxy = jnp.concatenate([px[:, 1:], px[:, -1:]], axis=1)
    return jnp.concatenate([planes, px, py, pxy], axis=-1)


def _bilinear_plane(planes: jax.Array, uv: jax.Array) -> jax.Array:
    """planes [3, R, R, C], uv [N, 3, 2] in [0, 1] → [N, 3, C].

    One quad-packed gather of 3 rows/point (one per plane) — see
    `_quad_pack` for why this is the minimal row count."""
    R = planes.shape[1]
    C = planes.shape[-1]
    pos = jnp.clip(uv, 0.0, 1.0) * (R - 1)
    p0 = jnp.floor(pos)
    frac = pos - p0                                         # [N, 3, 2]
    i0 = p0.astype(jnp.int32)

    quads = _quad_pack(planes)                              # [3, R, R, 4C]
    flat = quads.reshape(3 * R * R, 4 * C)
    base = jnp.arange(3, dtype=jnp.int32)[None, :] * (R * R)   # [1, 3]
    ids = base + i0[..., 0] * R + i0[..., 1]                # [N, 3]
    vals = flat[ids.reshape(-1)].reshape(*ids.shape, 4, C)  # [N, 3, 4, C]
    fy, fx = frac[..., 0:1], frac[..., 1:2]                 # [N, 3, 1]
    w = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                   fy * (1 - fx), fy * fx], axis=-2)        # [N, 3, 4, 1]
    return jnp.sum(vals * w, axis=-2)                       # [N, 3, C]


def triplane_encode(
    x: jax.Array,                      # [N, 3] in [0, 1]
    planes: List[jax.Array],
    spec: TriplaneSpec,
    max_level: Optional[jax.Array] = None,
    out_dtype=None,
) -> jax.Array:
    """[N, 3] → [N, output_dim]; coarse→fine scale masking via max_level
    (mirrors the hash grid's progressive-level training, grid.py:40)."""
    xf = jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)

    S = spec.num_scales
    if max_level is not None:
        n_active = jnp.clip(jnp.ceil(max_level * S), 1, S)
    else:
        n_active = None

    outs = []
    for s, r in enumerate(spec.resolutions):
        uv = jnp.stack([xf[:, (a, b)] for a, b in _PLANE_AXES], axis=1)
        feat = _bilinear_plane(planes[s], uv)               # [N, 3, C]
        if spec.reduce == "sum":
            feat = jnp.sum(feat, axis=1)                    # [N, C]
        else:
            feat = feat.reshape(feat.shape[0], -1)          # [N, 3C]
        # scale 0 is the finest: mask from the coarse end like the hashgrid
        if n_active is not None:
            feat = feat * ((S - 1 - s) < n_active).astype(feat.dtype)
        outs.append(feat)
    out = jnp.concatenate(outs, axis=-1)
    out = jnp.where(oob, 0.0, out)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def _bilinear_plane_with_grad(planes: jax.Array, uv: jax.Array
                              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Like `_bilinear_plane` but also returns the exact spatial derivative
    of the interpolated feature wrt the two plane coordinates, computed
    from the SAME quad-packed gather rows.

    Why: autograd normals (`jax.grad` of σ) re-differentiate the gather, and
    every differentiation context transposes to its own scatter-add into the
    planes — the lambertian train step compiled to 4 separate 1.18M-row
    scatters (measured ~25 ms extra, scripts/profile_step_scan.py T5 vs T6).
    Closed-form bilinear derivatives keep the whole (feature, ∂feature/∂x)
    pair linear in ONE gather's output, so the training backward emits ONE
    scatter (tests/test_triplane.py asserts the HLO scatter count).

    Returns (feat [N,3,C], dfeat/du [N,3,C], dfeat/dv [N,3,C]) where u is
    the row coordinate (uv[...,0]) and v the column, both in [0,1]; the
    derivatives are in [0,1]-units (already scaled by R-1) and zero outside
    the clipped domain (matching `jnp.clip`'s vjp almost everywhere)."""
    R = planes.shape[1]
    C = planes.shape[-1]
    inside = (uv > 0.0) & (uv < 1.0)                        # [N, 3, 2]
    pos = jnp.clip(uv, 0.0, 1.0) * (R - 1)
    p0 = jnp.floor(pos)
    frac = pos - p0                                         # [N, 3, 2]
    i0 = p0.astype(jnp.int32)

    quads = _quad_pack(planes)                              # [3, R, R, 4C]
    flat = quads.reshape(3 * R * R, 4 * C)
    base = jnp.arange(3, dtype=jnp.int32)[None, :] * (R * R)
    ids = base + i0[..., 0] * R + i0[..., 1]                # [N, 3]
    vals = flat[ids.reshape(-1)].reshape(*ids.shape, 4, C)  # [N, 3, 4, C]
    fy, fx = frac[..., 0:1], frac[..., 1:2]                 # [N, 3, 1]
    w = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                   fy * (1 - fx), fy * fx], axis=-2)        # [N, 3, 4, 1]
    dw_du = jnp.stack([-(1 - fx), -fx, (1 - fx), fx], axis=-2)
    dw_dv = jnp.stack([-(1 - fy), (1 - fy), -fy, fy], axis=-2)
    scale = jnp.float32(R - 1)
    mask_u = inside[..., 0:1].astype(w.dtype)               # [N, 3, 1]
    mask_v = inside[..., 1:2].astype(w.dtype)
    feat = jnp.sum(vals * w, axis=-2)
    dfeat_du = jnp.sum(vals * dw_du, axis=-2) * scale * mask_u
    dfeat_dv = jnp.sum(vals * dw_dv, axis=-2) * scale * mask_v
    return feat, dfeat_du, dfeat_dv


def triplane_encode_with_xgrad(
    x: jax.Array,                      # [N, 3] in [0, 1]
    planes: List[jax.Array],
    spec: TriplaneSpec,
    max_level: Optional[jax.Array] = None,
    out_dtype=None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array]]:
    """`triplane_encode` plus the exact jacobian ∂feat/∂x, from one gather
    per (sample, plane, scale).

    Returns (feat [N, D], (jx, jy, jz)) with each j* of shape [N, D] — the
    per-xyz-axis derivative in [0,1]-coordinate units.  The jacobian is
    deliberately NOT packed into one [N, D, 3] array: a minor dimension of
    3 pads to the 128-lane tile on TPU (42× memory blowup at any fusion
    boundary) and such layouts crashed this libtpu's compiler outright."""
    xf = jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)

    S = spec.num_scales
    n_active = (jnp.clip(jnp.ceil(max_level * S), 1, S)
                if max_level is not None else None)

    feats, jxs, jys, jzs = [], [], [], []
    N = x.shape[0]
    for s, r in enumerate(spec.resolutions):
        uv = jnp.stack([xf[:, (a, b)] for a, b in _PLANE_AXES], axis=1)
        feat, dfu, dfv = _bilinear_plane_with_grad(planes[s], uv)  # [N,3,C]
        C = feat.shape[-1]
        # route plane-coordinate derivatives to xyz axes
        # (_PLANE_AXES = xy, xz, yz: u is the first listed axis, v the second)
        z0 = jnp.zeros_like(dfu[:, 0])
        jx = jnp.stack([dfu[:, 0], dfu[:, 1], z0], axis=1)   # ∂/∂x per plane
        jy = jnp.stack([dfv[:, 0], z0, dfu[:, 2]], axis=1)   # ∂/∂y
        jz = jnp.stack([z0, dfv[:, 1], dfv[:, 2]], axis=1)   # ∂/∂z
        if spec.reduce == "sum":
            feat = jnp.sum(feat, axis=1)                    # [N, C]
            jx, jy, jz = (jnp.sum(j, axis=1) for j in (jx, jy, jz))
        else:
            feat = feat.reshape(N, 3 * C)
            jx, jy, jz = (j.reshape(N, 3 * C) for j in (jx, jy, jz))
        if n_active is not None:
            m = ((S - 1 - s) < n_active).astype(feat.dtype)
            feat = feat * m
            jx, jy, jz = (j * m for j in (jx, jy, jz))
        feats.append(feat)
        jxs.append(jx)
        jys.append(jy)
        jzs.append(jz)
    feat = jnp.concatenate(feats, axis=-1)
    jx = jnp.concatenate(jxs, axis=-1)
    jy = jnp.concatenate(jys, axis=-1)
    jz = jnp.concatenate(jzs, axis=-1)
    feat = jnp.where(oob, 0.0, feat)
    jx, jy, jz = (jnp.where(oob, 0.0, j) for j in (jx, jy, jz))
    if out_dtype is not None:
        feat = feat.astype(out_dtype)
        jx, jy, jz = (j.astype(out_dtype) for j in (jx, jy, jz))
    return feat, (jx, jy, jz)


def triplane_tv_loss(planes: List[jax.Array]) -> jax.Array:
    """Total-variation regularizer over all planes (the dense analog of the
    hash grid's grad_total_variation, gridencoder/grid.py:172-193)."""
    tv = jnp.zeros(())
    for p in planes:
        tv = tv + jnp.mean((p[:, 1:] - p[:, :-1]) ** 2) + \
            jnp.mean((p[:, :, 1:] - p[:, :, :-1]) ** 2)
    return tv / len(planes)
