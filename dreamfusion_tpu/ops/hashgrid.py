"""Multiresolution hash-grid encoding (instant-NGP).

TPU-native equivalent of the `gridencoder` CUDA extension
(/root/reference/gridencoder/src/gridencoder.cu, wrapper gridencoder/grid.py).
Semantics matched:

  * L levels, C features/level, per-level resolution res_l =
    ceil(base * scale^l), table size min(2^log2_T, res_l^D).
  * tiled (stride) indexing while res_l^D fits the table, xor-prime
    `fast_hash` otherwise (gridencoder.cu:46-79), uint32 wraparound included.
  * align_corners on/off, linear or smoothstep interpolation
    (gridencoder.cu:139-161), out-of-[0,1] inputs produce zeros.
  * progressive `max_level` masking (grid.py:40,62) — here a *traced* scalar
    so level schedules stay inside jit.

Design: instead of one CUDA thread per (point, level) with atomicAdd
gradients, each level is a dense gather of 2^D corners over the whole point
batch; XLA's gather VJP is a deterministic scatter-add (no atomics, no
nondeterminism).  The Python loop over the 16 levels unrolls at trace time.

Why no Pallas kernel: measured on the target TPU, gathers/scatters are
row-latency-bound (~6.5 / ~60 ns per row) and a Pallas per-element VMEM
gather is ~90× slower than XLA's gather — the hash grid's cost is its
L·2^D row count, which no kernel can reduce.  The TPU-first answer is the
triplane encoder (ops/triplane.py, ~10× fewer rows), kept alongside this
reference-parity hash grid.

The embedding table stays fp32 (hash tables are tiny vs HBM but gradients
are sparse and benefit from fp32 accumulation); outputs are cast to the
requested compute dtype.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


@dataclass(frozen=True)
class HashGridSpec:
    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: Optional[int] = 2048
    per_level_scale: float = 2.0
    # hash  — tcnn-parity xor-prime hashing (gridencoder.cu:46-79)
    # affine — additive-congruential hashing: same large odd primes, but
    #          summed instead of xored, making the hash affine in lattice
    #          coords → 1 packed gather row per (sample, level) (TPU-first
    #          fast path; collision lattice instead of xor scatter)
    # tiled — raster indexing with wraparound at every level
    gridtype: str = "hash"           # hash | affine | tiled
    align_corners: bool = False
    interpolation: str = "linear"    # linear | smoothstep

    @property
    def scale(self) -> float:
        if self.desired_resolution is not None:
            return 2.0 ** (
                math.log2(self.desired_resolution / self.base_resolution)
                / (self.num_levels - 1)
            )
        return self.per_level_scale

    @property
    def resolutions(self) -> Tuple[int, ...]:
        return tuple(
            int(np.ceil(self.base_resolution * self.scale ** l))
            for l in range(self.num_levels)
        )

    @property
    def level_sizes(self) -> Tuple[int, ...]:
        max_params = 2 ** self.log2_hashmap_size
        return tuple(
            min(max_params, r ** self.input_dim) for r in self.resolutions
        )

    @property
    def offsets(self) -> Tuple[int, ...]:
        off = [0]
        for s in self.level_sizes:
            off.append(off[-1] + s)
        return tuple(off)

    @property
    def table_size(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim


def init_hashgrid(key: jax.Array, spec: HashGridSpec,
                  scale: float = 1e-4) -> jax.Array:
    """Uniform(-1e-4, 1e-4) init (reference grid.py:146-148)."""
    return jax.random.uniform(
        key, (spec.table_size, spec.level_dim), minval=-scale, maxval=scale,
        dtype=jnp.float32,
    )


def _level_index(pos_grid: jax.Array, res: int, hashmap_size: int,
                 gridtype: str) -> jax.Array:
    """pos_grid: [..., D] uint32 lattice coords → flat table index [...].

    Static decision between stride and hash indexing per level (the CUDA
    kernel decides with `stride <= hashmap_size` mid-loop,
    gridencoder.cu:62-79)."""
    D = pos_grid.shape[-1]
    pg = pos_grid.astype(jnp.uint32)
    index = jnp.zeros(pos_grid.shape[:-1], dtype=jnp.uint32)
    stride = 1
    for d in range(D):
        if stride > hashmap_size:
            break
        index = index + pg[..., d] * jnp.uint32(stride % (1 << 32))
        stride *= res
    if gridtype in ("hash", "affine") and stride > hashmap_size:
        index = jnp.zeros(pos_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(D):
            term = pg[..., d] * jnp.uint32(_PRIMES[d])
            # affine: SUM the products instead of XORing them.  Addition
            # makes the hash affine in the lattice coords, so a cell's
            # 2^D corner indices differ from its base index by CONSTANT
            # per-level offsets — which is what lets hash_encode serve a
            # hashed level from ONE corner-packed gathered row per sample
            # (the packed table is 2^D rolls of the parameter table).
            # Collisions form a lattice instead of xor's scatter, but the
            # multipliers are the same large odd primes; quality parity is
            # checked by the convergence benchmark.
            index = (index + term) if gridtype == "affine" else (index ^ term)
    return (index % jnp.uint32(hashmap_size)).astype(jnp.int32)


def _corner_pack(slab: jax.Array) -> jax.Array:
    """[res, ..., res, C] (D spatial dims, axis d_spatial = D-1-d in corner-
    bit terms) → [res, ..., res, 2^D * C]: each cell's row holds all 2^D
    interpolation corners, edge-clamped.

    Same rationale as ops/triplane._quad_pack: gathers/scatters on this
    backend cost per ROW (~6.5/60 ns independent of width ≤128 lanes), so
    packing the corner block turns 2^D rows per (sample, level) into 1.
    Only possible for *dense* (tiled) levels where corners are lattice
    neighbors — hashed levels scatter corners across the table."""
    D = slab.ndim - 1

    def shift(a, axis):
        lo = [slice(None)] * a.ndim
        hi = [slice(None)] * a.ndim
        lo[axis] = slice(1, None)
        hi[axis] = slice(-1, None)
        return jnp.concatenate([a[tuple(lo)], a[tuple(hi)]], axis=axis)

    corners = []
    for corner in range(1 << D):
        s = slab
        for d in range(D):
            if (corner >> d) & 1:
                s = shift(s, D - 1 - d)
        corners.append(s)
    return jnp.concatenate(corners, axis=-1)


def _level_geom(xf: jax.Array, spec: HashGridSpec, res: int
                ) -> Tuple[jax.Array, jax.Array]:
    """Per-level lattice base coords [N, D] (uint32) + per-corner
    interpolation weights [N, 2^D] (corner bit d = dim d)."""
    D = xf.shape[-1]
    if spec.align_corners:
        pos = xf * (res - 1)
        pos_grid = jnp.clip(jnp.floor(pos), 0, max(res - 2, 0))
    else:
        pos = jnp.clip(xf * res - 0.5, 0.0, res - 1)
        pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    if spec.interpolation == "smoothstep":
        w_frac = frac * frac * (3.0 - 2.0 * frac)
    else:
        w_frac = frac
    bits = jnp.asarray(
        [[(corner >> d) & 1 for d in range(D)]
         for corner in range(1 << D)], dtype=jnp.float32)       # [2^D, D]
    w_all = jnp.prod(
        jnp.where(bits[None].astype(bool), w_frac[:, None, :],
                  1.0 - w_frac[:, None, :]), axis=-1)           # [N, 2^D]
    return pos_grid.astype(jnp.uint32), w_all


def hash_encode(
    x: jax.Array,                     # [N, D] in [0, 1]
    table: jax.Array,                 # [table_size, C] fp32
    spec: HashGridSpec,
    max_level: Optional[jax.Array] = None,   # traced scalar in [0, 1]
    out_dtype=None,
) -> jax.Array:
    """Forward encoding: [N, D] → [N, L*C].

    All levels are served by at most TWO gather ops (and therefore two
    scatter-adds in the backward), regardless of L:

      * packed levels — dense (tiled) levels corner-pack their slab, and
        with `gridtype='affine'` hashed levels corner-pack via 2^D rolls
        of their table slice (corner offsets are constant under an affine
        hash); all concatenate into one table → ONE gathered ≤128-lane
        row per (sample, level);
      * xor-hashed levels (`gridtype='hash'`, tcnn parity) — corners land
        at unrelated rows, so the (level, corner) lookups batch into one
        gather of [N, L_hash·2^D] rows.

    Rows are the irreducible cost on this backend (~6.5 ns gather /
    ~60 ns scatter per row, CLAUDE.md gotcha 3): 'affine' cuts rows per
    sample from L_dense + 8·L_hash (≈93 at default spec) to L (16)."""
    N, D = x.shape
    C = spec.level_dim
    L = spec.num_levels
    xf = x.astype(jnp.float32)

    oob = jnp.any((xf < 0.0) | (xf > 1.0), axis=-1, keepdims=True)  # [N, 1]

    if max_level is not None:
        # reference: max(min(ceil(frac*L), L), 1) active levels (grid.py:40)
        n_active = jnp.clip(jnp.ceil(max_level * L), 1, L)
    else:
        n_active = None

    dense_levels = [l for l in range(L)
                    if spec.level_sizes[l] == spec.resolutions[l] ** D]
    hashed = [l for l in range(L) if l not in dense_levels]
    # affine hashing keeps corner offsets constant per level, so hashed
    # levels ride the 1-row packed path too; xor levels need 2^D rows.
    packed_levels = dense_levels + (hashed if spec.gridtype == "affine"
                                    else [])
    hash_levels = [] if spec.gridtype == "affine" else hashed
    level_out: List[Optional[jax.Array]] = [None] * L

    if packed_levels:
        packed_tables, idx_cols, w_cols = [], [], []
        acc = 0
        for l in packed_levels:
            res, hsize, off = (spec.resolutions[l], spec.level_sizes[l],
                               spec.offsets[l])
            if l in dense_levels:
                # slab axes are (d_{D-1}, ..., d_0, C): the stride order in
                # _level_index is x + y*res + z*res^2
                slab = table[off:off + hsize].reshape((res,) * D + (C,))
                packed_tables.append(
                    _corner_pack(slab).reshape(hsize, (1 << D) * C))
            else:
                # affine-hashed level: index(base + corner_j) =
                # (index(base) + off_j) mod hsize with CONSTANT off_j =
                # Σ_d bit_d(j)·prime_d — so the corner-packed table is just
                # 2^D rolls of the parameter slice (dense ops, cheap VJP),
                # and the lookup is one gathered row per sample.  Corner
                # coords are deliberately NOT edge-clamped here: an
                # out-of-lattice corner can only occur at frac == 0 where
                # its interpolation weight is exactly zero.
                assert hsize & (hsize - 1) == 0, "hashed size must be 2^k"
                sub = table[off:off + hsize]
                corners = []
                for corner in range(1 << D):
                    off_j = sum(_PRIMES[d] for d in range(D)
                                if (corner >> d) & 1) % hsize
                    corners.append(sub if off_j == 0
                                   else jnp.roll(sub, -off_j, axis=0))
                packed_tables.append(jnp.concatenate(corners, axis=-1))
            base, w_all = _level_geom(xf, spec, res)
            idx_cols.append(
                _level_index(base, res, hsize, spec.gridtype) + acc)
            w_cols.append(w_all)
            acc += hsize
        big = jnp.concatenate(packed_tables, axis=0)     # [sum, 2^D·C]
        idx = jnp.stack(idx_cols, axis=1)                # [N, Lp]
        vals = big[idx.reshape(-1)].reshape(N, len(packed_levels), 1 << D, C)
        w = jnp.stack(w_cols, axis=1)                    # [N, Lp, 2^D]
        outs = jnp.einsum("nlk,nlkc->nlc", w, vals)      # [N, Lp, C]
        for i, l in enumerate(packed_levels):
            level_out[l] = outs[:, i]

    if hash_levels:
        idx_cols, w_cols = [], []
        for l in hash_levels:
            res, hsize, off = (spec.resolutions[l], spec.level_sizes[l],
                               spec.offsets[l])
            base, w_all = _level_geom(xf, spec, res)
            for corner in range(1 << D):
                sel = jnp.asarray(
                    [(corner >> d) & 1 for d in range(D)], dtype=jnp.uint32)
                pg = jnp.minimum(base + sel, jnp.uint32(res - 1))
                idx_cols.append(
                    off + _level_index(pg, res, hsize, spec.gridtype))
            w_cols.append(w_all)
        idx = jnp.stack(idx_cols, axis=1)                # [N, Lh·2^D]
        vals = table[idx.reshape(-1)].reshape(
            N, len(hash_levels), 1 << D, C)
        w = jnp.stack(w_cols, axis=1)                    # [N, Lh, 2^D]
        outs = jnp.einsum("nlk,nlkc->nlc", w, vals)
        for i, l in enumerate(hash_levels):
            level_out[l] = outs[:, i]

    out = jnp.concatenate(level_out, axis=-1)            # [N, L*C]
    if n_active is not None:
        mask = (jnp.arange(L) < n_active).astype(out.dtype)  # [L]
        out = out * jnp.repeat(mask, C)[None, :]
    out = jnp.where(oob, 0.0, out)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def hashgrid_tv_loss(
    key: jax.Array,
    table: jax.Array,
    spec: HashGridSpec,
    n_samples: int = 4096,
    bound: float = 1.0,
) -> jax.Array:
    """Total-variation regularizer on the hash grid.

    Reference injects a TV *gradient* directly at sampled lattice sites
    (gridencoder.cu:526-668, grid.py:172-193); here we express the same
    regularizer as a differentiable loss: squared differences between
    neighboring lattice entries around uniformly sampled cells, per level.
    """
    D = spec.input_dim
    total = jnp.zeros((), dtype=jnp.float32)
    keys = jax.random.split(key, spec.num_levels)
    for l in range(spec.num_levels):
        res = spec.resolutions[l]
        hsize = spec.level_sizes[l]
        off = spec.offsets[l]
        cells = jax.random.randint(keys[l], (n_samples, D), 0, max(res - 1, 1))
        cells = cells.astype(jnp.uint32)
        idx0 = _level_index(cells, res, hsize, spec.gridtype)
        v0 = table[off + idx0]
        lvl = jnp.zeros((), dtype=jnp.float32)
        for d in range(D):
            nb = cells.at[:, d].add(jnp.uint32(1))
            nb = jnp.minimum(nb, jnp.uint32(res - 1))
            idx1 = _level_index(nb, res, hsize, spec.gridtype)
            v1 = table[off + idx1]
            lvl = lvl + jnp.mean(jnp.sum((v1 - v0) ** 2, axis=-1))
        total = total + lvl / D
    return total / spec.num_levels


def hashgrid_wd_loss(table: jax.Array, spec: HashGridSpec) -> jax.Array:
    """Level-meaned weight decay (reference gridencoder.cu:671-707,
    grid.py:195-206): each level's L2 norm normalized by its table size so
    small coarse levels are not over-penalized relative to big fine ones."""
    total = jnp.zeros((), dtype=jnp.float32)
    for l in range(spec.num_levels):
        off, size = spec.offsets[l], spec.level_sizes[l]
        lvl = table[off:off + size]
        total = total + jnp.sum(lvl * lvl) / size
    return 0.5 * total / spec.num_levels
