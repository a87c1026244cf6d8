"""Tile-based differentiable triangle rasterizer (pure XLA).

TPU-native replacement for nvdiffrast (`dr.rasterize/interpolate/antialias`,
used by the reference DMTet path at /root/reference/nerf/renderer.py:898-933
and the texture baker at :464-472).  nvdiffrast is CUDA/OpenGL; there is no
TPU analog, so this is a from-scratch design:

  1. triangles → clip space → NDC → screen; per-triangle bbox;
  2. *binning*: for each screen tile (TILE×TILE px), gather up to
     `tile_cap` overlapping triangles via masked `top_k` (static shapes);
  3. per-tile brute-force coverage: barycentrics for every (pixel, tri)
     pair in the tile, z-buffer resolve via argmin on depth.

Differentiability: barycentric weights are smooth functions of the
projected vertices, so gradients flow from interpolated attributes into
vertex positions (the same path nvdiffrast's `interpolate` provides).
nvdiffrast's `antialias` silhouette gradients are approximated with a
signed-distance soft edge on the alpha channel (`soft_edge_px`).

Cost: O(P·tile_cap) fused multiply-adds — dense, static, MXU/VPU friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class RasterOut(NamedTuple):
    bary: jax.Array        # [H, W, 3] barycentrics of winning triangle
    tri_id: jax.Array      # [H, W] int32 (-1 = background)
    depth: jax.Array       # [H, W] NDC depth of hit
    alpha: jax.Array       # [H, W] coverage (soft if soft_edge_px > 0)


def project_verts(verts: jax.Array, mvp: jax.Array) -> jax.Array:
    """world [V,3] → clip [V,4] (row-vector convention: v_clip = mvp @ v)."""
    vh = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], axis=-1)
    return jnp.einsum("ij,vj->vi", mvp, vh)


def rasterize(
    clip_verts: jax.Array,     # [V, 4]
    faces: jax.Array,          # [T, 3] int32
    face_mask: jax.Array,      # [T] bool
    H: int, W: int,
    tile: int = 32,
    tile_cap: int = 512,
    soft_edge_px: float = 1.0,
    tile_batch: Optional[int] = None,
) -> RasterOut:
    """tile_batch bounds the live (pixel × triangle) temp: tiles are swept
    in lax.map chunks of `tile_batch` (auto: ~256 MB of f32 temps) instead
    of one vmap over every tile — at tex_res 1024 / cap 1024 the all-tiles
    sweep materializes a 12 GB [tiles, px, cap, 3] tensor (OOM'd the
    round-3 mesh export on the TPU)."""
    T = faces.shape[0]
    w = clip_verts[:, 3:4]
    ndc = clip_verts[:, :3] / jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)   # [V, 3]
    # NDC x∈[-1,1] → screen px; y flipped (image row 0 = top)
    sx = (ndc[:, 0] * 0.5 + 0.5) * W
    sy = (-ndc[:, 1] * 0.5 + 0.5) * H
    sz = ndc[:, 2]
    screen = jnp.stack([sx, sy], axis=-1)                              # [V, 2]

    p0 = screen[faces[:, 0]]
    p1 = screen[faces[:, 1]]
    p2 = screen[faces[:, 2]]
    z0, z1, z2 = sz[faces[:, 0]], sz[faces[:, 1]], sz[faces[:, 2]]
    w0c = w[faces[:, 0], 0]
    behind = (w0c <= 0) | (w[faces[:, 1], 0] <= 0) | (w[faces[:, 2], 0] <= 0)
    valid = face_mask & ~behind

    # tile binning
    nty, ntx = -(-H // tile), -(-W // tile)
    bb_min = jnp.minimum(jnp.minimum(p0, p1), p2)                      # [T, 2]
    bb_max = jnp.maximum(jnp.maximum(p0, p1), p2)
    pad = soft_edge_px + 1.0
    tx0 = jnp.floor((bb_min[:, 0] - pad) / tile).astype(jnp.int32)
    tx1 = jnp.floor((bb_max[:, 0] + pad) / tile).astype(jnp.int32)
    ty0 = jnp.floor((bb_min[:, 1] - pad) / tile).astype(jnp.int32)
    ty1 = jnp.floor((bb_max[:, 1] + pad) / tile).astype(jnp.int32)

    tyi = jnp.arange(nty)[:, None]
    txi = jnp.arange(ntx)[None, :]
    # overlap [nty, ntx, T]
    overlap = (
        valid[None, None, :]
        & (tx0[None, None, :] <= txi[:, :, None])
        & (tx1[None, None, :] >= txi[:, :, None])
        & (ty0[None, None, :] <= tyi[:, :, None])
        & (ty1[None, None, :] >= tyi[:, :, None])
    )
    # compact per tile
    score = overlap.astype(jnp.float32) * (
        1.0 + jnp.arange(T, 0, -1, dtype=jnp.float32)[None, None, :] / (T + 1))
    _, tri_idx = jax.lax.top_k(score.reshape(nty * ntx, T), tile_cap)  # [G, C]
    tri_in = overlap.reshape(nty * ntx, T)
    got = jnp.take_along_axis(tri_in, tri_idx, axis=-1)                # [G, C]

    # gather per-tile triangle data
    g = lambda arr: arr[tri_idx]                                       # [G, C, ...]
    tp0, tp1, tp2 = g(p0), g(p1), g(p2)
    tz = jnp.stack([g(z0), g(z1), g(z2)], axis=-1)                     # [G, C, 3]

    # pixel centers per tile
    py = (jnp.arange(tile)[:, None] + 0.5)
    px = (jnp.arange(tile)[None, :] + 0.5)
    tile_y0 = (jnp.arange(nty) * tile)[:, None].repeat(ntx, 1).reshape(-1)
    tile_x0 = (jnp.arange(ntx) * tile)[None, :].repeat(nty, 0).reshape(-1)
    pxy = jnp.stack(
        [jnp.broadcast_to(px, (tile, tile)),
         jnp.broadcast_to(py, (tile, tile))], axis=-1)                 # [t,t,2]

    def raster_tile(x0, y0, q0, q1, q2, qz, qgot, qid):
        # barycentrics are LINEAR in pixel coords, so the whole
        # (pixel × triangle) sweep is one MXU einsum over per-triangle
        # coefficient stacks instead of P×C elementwise VPU math
        pix = pxy + jnp.array([x0, y0], jnp.float32)                   # [t,t,2]
        pixh = jnp.concatenate(
            [pix.reshape(-1, 2), jnp.ones((tile * tile, 1))], -1)      # [P,3]
        e0 = q1 - q0                                                   # [C,2]
        e1 = q2 - q0
        den = e0[:, 0] * e1[:, 1] - e0[:, 1] * e1[:, 0]                # [C]
        den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
        inv = 1.0 / den
        # bu = ((px - q0x)·e1y − (py − q0y)·e1x) / den  →  a·px + b·py + c
        cu = jnp.stack([e1[:, 1] * inv, -e1[:, 0] * inv,
                        (q0[:, 1] * e1[:, 0] - q0[:, 0] * e1[:, 1]) * inv],
                       axis=-1)                                        # [C,3]
        cv = jnp.stack([-e0[:, 1] * inv, e0[:, 0] * inv,
                        (q0[:, 0] * e0[:, 1] - q0[:, 1] * e0[:, 0]) * inv],
                       axis=-1)
        # z is linear in (bu, bv): z = z0 + bu(z1−z0) + bv(z2−z0)
        cz = (cu * (qz[:, 1] - qz[:, 0])[:, None]
              + cv * (qz[:, 2] - qz[:, 0])[:, None])
        cz = cz.at[:, 2].add(qz[:, 0])
        coeffs = jnp.stack([cu, cv, cz], axis=1)                       # [C,3,3]
        vals = jnp.einsum("pk,cok->pco", pixh, coeffs,
                          preferred_element_type=jnp.float32)          # [P,C,3]
        bu, bv, zval = vals[..., 0], vals[..., 1], vals[..., 2]
        bw = 1.0 - bu - bv
        inside = (bu >= 0) & (bv >= 0) & (bw >= 0) & qgot[None, :]
        zsort = jnp.where(inside, zval, jnp.inf)
        best = jnp.argmin(zsort, axis=-1)                              # [P]
        pr = jnp.arange(pixh.shape[0])
        hit = inside[pr, best]
        bary = jnp.stack([bw[pr, best], bu[pr, best], bv[pr, best]],
                         axis=-1)                                      # [P,3]
        tri = jnp.where(hit, qid[best], -1)
        zbest = jnp.where(hit, zval[pr, best], 1.0)

        if soft_edge_px > 0:
            # signed distance to nearest covering triangle boundary:
            # for the winning (or nearest) triangle, alpha =
            # sigmoid(dist/soft_edge_px) with dist<0 outside
            bmin = jnp.minimum(jnp.minimum(bu, bv), bw)                # [P,C]
            # convert bary margin to ~pixels using triangle size
            scale = jnp.sqrt(jnp.abs(den))[None, :]
            margin = bmin * scale
            margin = jnp.where(qgot[None, :], margin, -1e9)
            best_m = jnp.max(margin, axis=-1)
            alpha = jax.nn.sigmoid(best_m / soft_edge_px * 4.0)
        else:
            alpha = hit.astype(jnp.float32)
        return (bary.reshape(tile, tile, 3), tri.reshape(tile, tile),
                zbest.reshape(tile, tile), alpha.reshape(tile, tile))

    G = nty * ntx
    if tile_batch is None:
        # budget ~256 MB for the dominant [batch, P, C, 3] f32 temp
        per_tile = tile * tile * tile_cap * 12
        tile_batch = max(1, min(G, (256 << 20) // max(per_tile, 1)))
    tile_batch = min(tile_batch, G)
    args = (tile_x0.astype(jnp.float32), tile_y0.astype(jnp.float32),
            tp0, tp1, tp2, tz, got, tri_idx)
    if tile_batch >= G:
        bary_t, tri_t, z_t, a_t = jax.vmap(raster_tile)(*args)
    else:
        n_b = -(-G // tile_batch)
        pad_g = n_b * tile_batch - G
        def prep(x):
            if pad_g:
                # padded tiles carry got=False → no hits; sliced off below
                x = jnp.concatenate(
                    [x, jnp.zeros((pad_g,) + x.shape[1:], x.dtype)])
            return x.reshape((n_b, tile_batch) + x.shape[1:])
        bary_t, tri_t, z_t, a_t = jax.lax.map(
            lambda a: jax.vmap(raster_tile)(*a), jax.tree.map(prep, args))
        def unb(x):
            return x.reshape((n_b * tile_batch,) + x.shape[2:])[:G]
        bary_t, tri_t, z_t, a_t = unb(bary_t), unb(tri_t), unb(z_t), unb(a_t)

    def untile(x):
        c = x.reshape(nty, ntx, tile, tile, *x.shape[3:])
        c = jnp.swapaxes(c, 1, 2)
        return c.reshape(nty * tile, ntx * tile, *x.shape[3:])[:H, :W]

    return RasterOut(bary=untile(bary_t), tri_id=untile(tri_t),
                     depth=untile(z_t), alpha=untile(a_t))


def interpolate(attrs: jax.Array, out: RasterOut,
                faces: jax.Array) -> jax.Array:
    """Per-vertex attributes [V, C] → per-pixel [H, W, C] via barycentrics
    (nvdiffrast dr.interpolate equivalent; differentiable wrt attrs and,
    through bary, wrt vertex positions)."""
    tri = jnp.maximum(out.tri_id, 0)
    f = faces[tri]                                         # [H, W, 3]
    a = attrs[f]                                           # [H, W, 3, C]
    val = jnp.einsum("hwk,hwkc->hwc", out.bary, a)
    return jnp.where((out.tri_id >= 0)[..., None], val, 0.0)
