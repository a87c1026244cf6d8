"""Mesh → signed distance field, TPU-native (pure jnp, chunked).

Replaces the reference's cubvh GPU BVH (`/root/reference/nerf/renderer.py:
826-859`: `cubvh.cuBVH(...).signed_distance(verts, mode='watertight')`)
for DMTet initialization from a mesh file (`--dmtet --init_with mesh.obj`,
main.py:320-329).  A BVH is a pointer-chasing structure that maps poorly
to the MXU; at DMTet-init scale (≈10⁵ tet vertices × ≈10⁴ triangles,
once per run) a DENSE chunked point×triangle sweep is simpler, exact,
and runs in well under a second on a TPU chip:

  * unsigned distance: closest-point-on-triangle (Eberly's region
    decomposition, vectorized over a [P, T] tile),
  * sign: generalized winding number (van Oosterom–Strackee solid
    angles) — robust for watertight meshes, graceful for near-watertight
    ones (threshold 0.5).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# OBJ loading (the reference loads via trimesh; we need no external dep)
# ---------------------------------------------------------------------------

def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ reader: vertices + triangulated faces (fan).

    Handles `v x y z` and `f i j k ...` with `v`, `v/vt`, `v//vn`,
    `v/vt/vn` index styles and negative (relative) indices."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):   # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    if not verts or not faces:
        raise ValueError(f"no geometry in OBJ file {path}")
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32))


def load_mesh(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh file → (verts [V,3] f32, tris [T,3] i32).  OBJ natively; PLY
    (ascii or binary_little_endian) via a tiny parser."""
    lower = path.lower()
    if lower.endswith(".obj"):
        return load_obj(path)
    if lower.endswith(".ply"):
        return _load_ply(path)
    raise ValueError(f"unsupported mesh format: {path} (obj/ply)")


_PLY_SCALARS = {
    "char": "<i1", "int8": "<i1", "uchar": "<u1", "uint8": "<u1",
    "short": "<i2", "int16": "<i2", "ushort": "<u2", "uint16": "<u2",
    "int": "<i4", "int32": "<i4", "uint": "<u4", "uint32": "<u4",
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
}


def _load_ply(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt, n_vert, n_face = None, 0, 0
        vprops = []                      # [(name, numpy dtype str)]
        fcount_t, findex_t = "<u1", "<i4"
        cur = None
        while True:
            line = f.readline()
            if not line:                 # truncated header — never spin
                raise ValueError(f"{path}: EOF before end_header")
            line = line.strip()
            if line.startswith(b"format"):
                fmt = line.split()[1].decode()
            elif line.startswith(b"element vertex"):
                n_vert = int(line.split()[-1]); cur = "v"
            elif line.startswith(b"element face"):
                n_face = int(line.split()[-1]); cur = "f"
            elif line.startswith(b"element"):
                cur = "other"
            elif line.startswith(b"property list") and cur == "f":
                _, _, ct, it, _name = line.decode().split()
                fcount_t = _PLY_SCALARS[ct]
                findex_t = _PLY_SCALARS[it]
            elif line.startswith(b"property") and cur == "v":
                _, typ, name = line.decode().split()
                vprops.append((name, _PLY_SCALARS[typ]))
            elif line == b"end_header":
                break
        names = [n for n, _ in vprops]
        if not all(a in names for a in "xyz"):
            raise ValueError(f"{path}: vertex x/y/z properties missing")
        if fmt == "ascii":
            verts = np.empty((n_vert, 3), np.float32)
            for i in range(n_vert):
                vals = f.readline().split()
                verts[i] = [float(vals[names.index(a)]) for a in "xyz"]
            faces = []
            for _ in range(n_face):
                vals = [int(x) for x in f.readline().split()]
                idx = vals[1:1 + vals[0]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
            return verts, np.asarray(faces, np.int32)
        if fmt == "binary_little_endian":
            vert_rec = np.dtype(vprops)
            raw = np.frombuffer(f.read(vert_rec.itemsize * n_vert),
                                dtype=vert_rec)
            if len(raw) != n_vert:
                raise ValueError(f"{path}: truncated vertex block")
            verts = np.stack([raw[a] for a in "xyz"], axis=1).astype(
                np.float32)
            cdt = np.dtype(fcount_t)
            idt = np.dtype(findex_t)
            faces = []
            for _ in range(n_face):
                n = int(np.frombuffer(f.read(cdt.itemsize), cdt)[0])
                idx = np.frombuffer(f.read(idt.itemsize * n), idt)
                for k in range(1, n - 1):
                    faces.append([int(idx[0]), int(idx[k]),
                                  int(idx[k + 1])])
            return verts, np.asarray(faces, np.int32)
        raise ValueError(f"{path}: unsupported PLY format {fmt}")


# ---------------------------------------------------------------------------
# point-triangle distance + winding number
# ---------------------------------------------------------------------------

def _point_tri_dist2(p, a, b, c):
    """Squared distance point→triangle, vectorized over any broadcasted
    leading shape.  p, a, b, c: [..., 3]."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-30)
    v = jnp.clip(vb / denom, 0.0, 1.0)
    w = jnp.clip(vc / denom, 0.0, 1.0)
    # face region candidate
    q_face = a + v[..., None] * ab + w[..., None] * ac

    # edge/vertex regions (Ericson, Real-Time Collision Detection 5.1.5)
    t_ab = jnp.clip(d1 / jnp.where(d1 - d3 == 0, 1e-30, d1 - d3), 0.0, 1.0)
    q_ab = a + t_ab[..., None] * ab
    t_ac = jnp.clip(d2 / jnp.where(d2 - d6 == 0, 1e-30, d2 - d6), 0.0, 1.0)
    q_ac = a + t_ac[..., None] * ac
    t_bc = jnp.clip((d4 - d3) /
                    jnp.where((d4 - d3) + (d5 - d6) == 0, 1e-30,
                              (d4 - d3) + (d5 - d6)), 0.0, 1.0)
    q_bc = b + t_bc[..., None] * (c - b)

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (~in_vert_a) & (~in_vert_b) & (d1 >= 0) & (d3 <= 0) & \
        (vc <= 0)
    in_edge_ac = (~in_vert_a) & (~in_vert_c) & (d2 >= 0) & (d6 <= 0) & \
        (vb <= 0)
    in_edge_bc = (~in_vert_b) & (~in_vert_c) & (d4 - d3 >= 0) & \
        (d5 - d6 >= 0) & (va <= 0)

    q = q_face
    q = jnp.where(in_edge_ab[..., None], q_ab, q)
    q = jnp.where(in_edge_ac[..., None], q_ac, q)
    q = jnp.where(in_edge_bc[..., None], q_bc, q)
    q = jnp.where(in_vert_a[..., None], a, q)
    q = jnp.where(in_vert_b[..., None], b, q)
    q = jnp.where(in_vert_c[..., None], c, q)
    return jnp.sum((p - q) ** 2, -1)


def _winding(p, a, b, c):
    """Generalized winding number contribution (solid angle / 4π) of
    triangle (a,b,c) seen from p; same broadcasted shapes as above."""
    ra = a - p
    rb = b - p
    rc = c - p
    la = jnp.linalg.norm(ra, axis=-1)
    lb = jnp.linalg.norm(rb, axis=-1)
    lc = jnp.linalg.norm(rc, axis=-1)
    det = jnp.sum(ra * jnp.cross(rb, rc), -1)
    den = la * lb * lc + jnp.sum(ra * rb, -1) * lc + \
        jnp.sum(rb * rc, -1) * la + jnp.sum(rc * ra, -1) * lb
    return jnp.arctan2(det, den) / (2.0 * jnp.pi)


def signed_distance(points: jax.Array, verts: jax.Array, tris: jax.Array,
                    chunk: int = 1024) -> jax.Array:
    """Signed distance of `points` [P, 3] to the triangle mesh
    (positive OUTSIDE — cubvh's 'watertight' convention, which the
    reference negates into inner-positive DMTet sdf, renderer.py:835)."""
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]
    P = points.shape[0]
    pad = (-P) % chunk
    pts = jnp.concatenate(
        [points, jnp.zeros((pad, 3), points.dtype)]) if pad else points

    def one_chunk(p):
        pe = p[:, None, :]                      # [chunk, 1, 3]
        d2 = _point_tri_dist2(pe, a[None], b[None], c[None])   # [chunk, T]
        wn = jnp.sum(_winding(pe, a[None], b[None], c[None]), -1)
        dist = jnp.sqrt(jnp.min(d2, axis=-1))
        return jnp.where(wn > 0.5, -dist, dist)

    out = jax.lax.map(one_chunk, pts.reshape(-1, chunk, 3))
    return out.reshape(-1)[:P]


def normalize_mesh(verts: np.ndarray) -> np.ndarray:
    """The reference's pre-normalization (renderer.py:820-823):
    center the bbox, scale so the longest extent is 0.8."""
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    scale = 0.8 / float(np.max(hi - lo))
    center = (hi + lo) / 2.0
    return ((verts - center) * scale).astype(np.float32)
