"""DMTet refinement stage: differentiable mesh optimization.

TPU-native re-design of the reference's `run_dmtet` path
(/root/reference/nerf/renderer.py:862-964) and `init_tet` (:817-859):
trainable (sdf, deform) on a tetrahedral grid → static-shape marching tets
(ops/marching_tets.py) → tile-based rasterization (ops/raster.py) → the
NeRF field queried as a texture field for albedo → lambertian shading →
background compositing.  Mesh regularizers (normal consistency, Laplacian)
come from the static topology.

The (sdf, deform) tensors are plain pytree params living next to the NeRF
field params; `lock_geo` freezes them (reference network_grid.py:168-170).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import safe_normalize
from ..mesh.tets import TetGrid
from ..ops.marching_tets import (TetMesh, laplacian_smooth_loss, marching_tets,
                                 normal_consistency_loss, vertex_normals)
from ..ops.raster import interpolate, project_verts, rasterize


class DMTetParams(NamedTuple):
    sdf: jax.Array       # [V]
    deform: jax.Array    # [V, 3]
    tet_scale: jax.Array # [3] — vertices are scaled by this (renderer.py:846)


@dataclass
class DMTetRenderer:
    grid: TetGrid
    max_tris: int = 1 << 17
    tile: int = 32
    tile_cap: int = 512
    soft_edge_px: float = 1.0

    def __post_init__(self):
        self.verts = jnp.asarray(self.grid.vertices)
        self.tets = jnp.asarray(self.grid.indices)
        self.tet_edges = jnp.asarray(self.grid.tet_edges)
        self.unique_edges = jnp.asarray(self.grid.unique_edges)

    # ------------------------------------------------------------------
    def init_params_from_density(
        self, density_fn, density_thresh: float,
        chunk: int = 500_000,
    ) -> DMTetParams:
        """SDF init from a trained NeRF density field (renderer.py:837-859):
        sdf = (σ − thresh).clamp(-1, 1); vertices pre-scaled so the occupied
        region fills the tet grid."""
        v = np.asarray(self.grid.vertices)
        sigmas = []
        for i in range(0, len(v), chunk):
            sigmas.append(np.asarray(density_fn(jnp.asarray(v[i:i + chunk]))))
        sigma = np.concatenate(sigmas)
        valid = sigma > density_thresh
        if valid.any():
            tet_scale = np.abs(v[valid]).max(axis=0) + 1e-1
        else:
            tet_scale = np.ones(3, np.float32)
        # rescale then re-query so the sdf matches the scaled vertices
        vs = v * tet_scale
        sigmas = []
        for i in range(0, len(vs), chunk):
            sigmas.append(np.asarray(density_fn(jnp.asarray(vs[i:i + chunk]))))
        sigma = np.concatenate(sigmas)
        sdf = np.clip(sigma - density_thresh, -1.0, 1.0).astype(np.float32)
        return DMTetParams(
            sdf=jnp.asarray(sdf),
            deform=jnp.zeros((len(v), 3), jnp.float32),
            tet_scale=jnp.asarray(tet_scale.astype(np.float32)),
        )

    def init_params_from_mesh(self, mesh_verts: np.ndarray,
                              mesh_tris: np.ndarray) -> DMTetParams:
        """SDF init from a mesh file (`--dmtet --init_with mesh.obj`,
        reference renderer.py:817-836): normalize the mesh to a 0.8-extent
        box, scale the tet grid to cover it, then
        sdf = clamp(-10 · signed_distance, -1, 1) — inner POSITIVE, the
        exact cubvh-watertight formula, computed by the dense chunked
        point×triangle sweep in mesh/sdf.py instead of a GPU BVH."""
        from ..mesh.sdf import normalize_mesh, signed_distance
        mv = normalize_mesh(np.asarray(mesh_verts, np.float32))
        # scalar global abs-max + 0.1: the reference's ACTIVE line
        # (renderer.py:829 — its per-axis variant at :828 is commented
        # out), broadcast to the per-axis tet_scale our renderer carries
        tet_scale = np.full((3,), float(np.abs(mv).max()) + 1e-1,
                            np.float32)
        pts = jnp.asarray(self.grid.vertices) * jnp.asarray(tet_scale)
        sd = signed_distance(pts, jnp.asarray(mv),
                             jnp.asarray(mesh_tris, np.int32))
        sdf = jnp.clip(-10.0 * sd, -1.0, 1.0).astype(jnp.float32)
        return DMTetParams(
            sdf=sdf,
            deform=jnp.zeros((self.grid.num_vertices, 3), jnp.float32),
            tet_scale=jnp.asarray(tet_scale),
        )

    def init_params_sphere(self, radius: float = 0.5) -> DMTetParams:
        d = radius - np.linalg.norm(self.grid.vertices, axis=-1)
        return DMTetParams(
            sdf=jnp.asarray(np.clip(d * 4, -1, 1).astype(np.float32)),
            deform=jnp.zeros((self.grid.num_vertices, 3), jnp.float32),
            tet_scale=jnp.ones((3,)),
        )

    # ------------------------------------------------------------------
    def extract_mesh(self, params: DMTetParams) -> TetMesh:
        """verts + tanh(deform)/(2*res) → marching tets
        (renderer.py:876-879)."""
        res = self.grid.resolution
        v = self.verts * params.tet_scale + jnp.tanh(params.deform) / (2 * res)
        return marching_tets(v, params.sdf, self.tets, self.tet_edges,
                             self.unique_edges, self.max_tris)

    # ------------------------------------------------------------------
    def render(
        self,
        params: DMTetParams,
        albedo_fn,                     # xyz [N,3] → albedo [N,3]
        mvp: jax.Array,                # [4, 4]
        H: int, W: int,
        rays_o: jax.Array,             # [H*W, 3] (for view dirs / bg)
        rays_d: jax.Array,
        light_d: Optional[jax.Array] = None,
        ambient_ratio: float = 1.0,
        shading: str = "lambertian",   # albedo | lambertian | normal | textureless
        bg_color: jax.Array | float = 1.0,
        need_regularizers: bool = False,
    ) -> Dict[str, jax.Array]:
        mesh = self.extract_mesh(params)
        clip_v = project_verts(mesh.verts, mvp)
        out = rasterize(clip_v, mesh.faces, mesh.face_mask, H, W,
                        tile=self.tile, tile_cap=self.tile_cap,
                        soft_edge_px=self.soft_edge_px)

        vn = vertex_normals(mesh)
        xyz = interpolate(mesh.verts, out, mesh.faces)         # [H, W, 3]
        nrm = safe_normalize(interpolate(vn, out, mesh.faces)) # [H, W, 3]

        albedo = albedo_fn(xyz.reshape(-1, 3)).reshape(H, W, 3)

        if light_d is None:
            light_d = safe_normalize(rays_o[0])
        lam = ambient_ratio + (1 - ambient_ratio) * jnp.maximum(
            jnp.sum(nrm * light_d, axis=-1), 0.0)              # [H, W]
        if shading == "albedo":
            color = albedo
        elif shading == "textureless":
            color = jnp.broadcast_to(lam[..., None], albedo.shape)
        elif shading == "normal":
            color = (nrm + 1.0) / 2.0
        else:
            color = albedo * lam[..., None]

        alpha = out.alpha[..., None]
        image = color * alpha + jnp.asarray(bg_color, jnp.float32) * \
            jnp.ones_like(color) * (1.0 - alpha)

        results: Dict[str, jax.Array] = {
            "image": image,
            "depth": out.depth,
            "weights_sum": out.alpha,
            "normal_image": (nrm + 1.0) / 2.0 * alpha,
        }
        if need_regularizers:
            results["normal_loss"] = normal_consistency_loss(mesh)
            results["lap_loss"] = laplacian_smooth_loss(mesh)
        return results
