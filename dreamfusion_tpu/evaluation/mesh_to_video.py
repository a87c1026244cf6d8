"""Turntable video of an exported OBJ mesh.

Reference: /root/reference/evaluation/mesh_to_video.py (pyvista orbit
render).  Here the exported mesh is re-rendered with the same JAX tile
rasterizer used for training (ops/raster.py): texture-mapped albedo +
lambertian shading, camera orbiting the object, mp4 out.

CLI:
  python -m dreamfusion_tpu.evaluation.mesh_to_video \
      --mesh ws/mesh/mesh.obj --out turntable.mp4 --frames 60 --size 512
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def render_turntable(verts: np.ndarray, tris: np.ndarray,
                     uv: np.ndarray | None, texture: np.ndarray | None,
                     frames: int = 60, size: int = 512,
                     radius: float = 3.2, elevation_deg: float = 75.0,
                     fovy_deg: float = 40.0):
    import jax
    import jax.numpy as jnp

    from ..core.math import safe_normalize
    from ..core.poses import circle_poses
    from ..core.rays import mvp_from_pose, projection_matrix
    from ..ops.raster import interpolate, project_verts, rasterize

    H = W = size
    v = jnp.asarray(verts)
    f = jnp.asarray(tris)
    fmask = jnp.ones((len(tris),), bool)
    tex = jnp.asarray(texture) if texture is not None else None
    uvj = jnp.asarray(uv) if uv is not None else None

    focal = H / (2 * np.tan(np.radians(fovy_deg) / 2))
    proj = projection_matrix(jnp.asarray(focal, jnp.float32), H, W, 0.01, 100.0)

    @jax.jit
    def render_one(mvp, cam_pos):
        clip = project_verts(v, mvp)
        out = rasterize(clip, f, fmask, H, W, tile=32,
                        tile_cap=min(2048, max(64, len(tris))),
                        soft_edge_px=0.0)
        # normals for lambert
        n0 = v[f[:, 0]]
        n1 = v[f[:, 1]]
        n2 = v[f[:, 2]]
        fn = jnp.cross(n1 - n0, n2 - n0)
        fn = fn * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(fn * fn, -1, keepdims=True), 1e-20))
        tri = jnp.maximum(out.tri_id, 0)
        nrm = fn[tri]                                        # [H, W, 3]
        light = safe_normalize(cam_pos)
        lam = 0.3 + 0.7 * jnp.abs(jnp.sum(nrm * light, -1))  # two-sided

        if tex is not None and uvj is not None:
            uvpix = interpolate(uvj, out, f)                  # [H, W, 2]
            th, tw = tex.shape[0], tex.shape[1]
            x = jnp.clip(uvpix[..., 0] * (tw - 1), 0, tw - 1)
            y = jnp.clip(uvpix[..., 1] * (th - 1), 0, th - 1)
            x0, y0 = jnp.floor(x).astype(int), jnp.floor(y).astype(int)
            x1, y1 = jnp.minimum(x0 + 1, tw - 1), jnp.minimum(y0 + 1, th - 1)
            wx, wy = (x - x0)[..., None], (y - y0)[..., None]
            alb = (tex[y0, x0] * (1 - wx) * (1 - wy) + tex[y0, x1] * wx * (1 - wy)
                   + tex[y1, x0] * (1 - wx) * wy + tex[y1, x1] * wx * wy)
        else:
            alb = jnp.full((H, W, 3), 0.7)
        color = alb * lam[..., None]
        a = out.alpha[..., None]
        return color * a + 1.0 * (1 - a)

    out_frames = []
    for i in range(frames):
        azim = i / frames * 360.0
        poses, _ = circle_poses(jnp.array([radius]),
                                jnp.array([elevation_deg]),
                                jnp.array([azim]))
        mvp = mvp_from_pose(poses, proj)[0]
        img = np.asarray(render_one(mvp, poses[0, :3, 3]))
        out_frames.append(np.clip(img, 0, 1))
    return out_frames


def main(argv=None):
    ap = argparse.ArgumentParser("mesh_to_video")
    ap.add_argument("--mesh", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--fps", type=int, default=25)
    args = ap.parse_args(argv)

    from ..mesh.export import read_obj
    from ..utils.image import save_video

    verts, tris, uv, tex_path = read_obj(args.mesh)
    texture = None
    if tex_path and os.path.exists(tex_path):
        from PIL import Image
        texture = np.asarray(Image.open(tex_path).convert("RGB"),
                             np.float32) / 255.0
    frames = render_turntable(verts, tris, uv, texture,
                              frames=args.frames, size=args.size)
    out = args.out or os.path.splitext(args.mesh)[0] + "_turntable.mp4"
    out = save_video(out, frames, fps=args.fps)
    print(f"wrote {out} ({len(frames)} frames @ {args.size}²)")
    return out


if __name__ == "__main__":
    main()
