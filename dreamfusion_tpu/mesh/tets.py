"""Tetrahedral grid generation + static marching-tets topology.

The reference ships quartet-generated tet grids (`tets/*.npz`, loaded at
nerf/renderer.py:290-294) and re-derives edge topology *every step* with
`torch.unique` (renderer.py:139-146) — inherently dynamic shapes.  Here the
grid is generated procedurally (each cube of an n³ lattice split into 6
tetrahedra around its main diagonal) and the unique-edge topology is
precomputed ONCE on the host:

  * `unique_edges [E, 2]`  — sorted vertex-id pairs
  * `tet_edges [F, 6]`     — per-tet edge → unique-edge index

so the per-step marching-tets pass (ops/marching_tets.py) is pure
static-shape gather/where math.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass
class TetGrid:
    vertices: np.ndarray       # [V, 3] float32 in [-1, 1]
    indices: np.ndarray        # [F, 4] int32
    unique_edges: np.ndarray   # [E, 2] int32 (sorted pairs)
    tet_edges: np.ndarray      # [F, 6] int32 → unique edge ids
    resolution: int

    @property
    def num_vertices(self) -> int:
        return len(self.vertices)

    @property
    def num_tets(self) -> int:
        return len(self.indices)

    @property
    def num_edges(self) -> int:
        return len(self.unique_edges)


# the 6 tets of a cube around the main diagonal (0,0,0)-(1,1,1)
_CUBE_TETS = np.array([
    [0, 1, 3, 7],
    [0, 1, 7, 5],
    [0, 5, 7, 4],
    [0, 4, 7, 6],
    [0, 6, 7, 2],
    [0, 2, 7, 3],
], dtype=np.int64)

# edge order matches the reference base_tet_edges (renderer.py:115):
# (0,1) (0,2) (0,3) (1,2) (1,3) (2,3)
TET_EDGE_PAIRS = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]],
                          dtype=np.int64)


def generate_tet_grid(n: int) -> TetGrid:
    """n³ cubes → 6n³ tets over [-1, 1]³. The reference's `tet_grid_size`
    counts quartet resolution; n = tet_grid_size // 2 gives comparable
    density (quartet-128 ≈ 1.5M tets ≈ cubic-64 split)."""
    g = n + 1
    ax = np.arange(g, dtype=np.float32)
    xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
    verts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3) / n * 2.0 - 1.0

    def vid(i, j, k):
        return (i * g + j) * g + k

    ci, cj, ck = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                             indexing="ij")
    ci, cj, ck = ci.ravel(), cj.ravel(), ck.ravel()
    # cube corner ids, bit order (x, y, z): corner c = (cx, cy, cz)
    corners = np.stack([
        vid(ci + ((c >> 2) & 1), cj + ((c >> 1) & 1), ck + (c & 1))
        for c in range(8)
    ], axis=-1)                                              # [n^3, 8]
    tets = corners[:, _CUBE_TETS].reshape(-1, 4).astype(np.int64)  # [6n^3, 4]
    return build_topology(verts.astype(np.float32), tets, n)


def build_topology(vertices: np.ndarray, tets: np.ndarray,
                   resolution: int) -> TetGrid:
    """Precompute unique-edge topology for any tet mesh (incl. the
    reference's quartet npz grids via `load_tet_grid`)."""
    edges = tets[:, TET_EDGE_PAIRS]                          # [F, 6, 2]
    edges = np.sort(edges, axis=-1).reshape(-1, 2)           # [F*6, 2]
    keys = edges[:, 0].astype(np.int64) * len(vertices) + edges[:, 1]
    uniq_keys, inverse = np.unique(keys, return_inverse=True)
    unique_edges = np.stack([uniq_keys // len(vertices),
                             uniq_keys % len(vertices)], axis=-1)
    return TetGrid(
        vertices=vertices.astype(np.float32),
        indices=tets.astype(np.int32),
        unique_edges=unique_edges.astype(np.int32),
        tet_edges=inverse.reshape(-1, 6).astype(np.int32),
        resolution=resolution,
    )


def load_tet_grid(path: str, scale: float = 2.0) -> TetGrid:
    """Load a quartet npz (vertices in [-0.5, 0.5], scaled ×2 to cover
    [-1,1] like renderer.py:293-294)."""
    data = np.load(path)
    verts = data["vertices"].astype(np.float32) * scale
    tets = data["indices"].astype(np.int64)
    n = int(round(len(verts) ** (1 / 3)))
    return build_topology(verts, tets, n)


def load_cached_tet_grid(cache_path: str, n: int) -> TetGrid:
    """generate_tet_grid with a topology disk cache (the 128-size unique-
    edge build costs tens of seconds; DMTet runs shouldn't pay it twice)."""
    import os
    if os.path.exists(cache_path):
        d = np.load(cache_path)
        return TetGrid(vertices=d["vertices"], indices=d["indices"],
                       unique_edges=d["unique_edges"],
                       tet_edges=d["tet_edges"],
                       resolution=int(d["resolution"]))
    grid = generate_tet_grid(n)
    os.makedirs(os.path.dirname(cache_path), exist_ok=True)
    tmp = cache_path + ".tmp.npz"
    np.savez(tmp, vertices=grid.vertices, indices=grid.indices,
             unique_edges=grid.unique_edges, tet_edges=grid.tet_edges,
             resolution=grid.resolution)
    os.replace(tmp, cache_path)
    return grid
