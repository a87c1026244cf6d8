"""Per-phase wall-clock of the textured mesh export on the real TPU.

RUN_r03's post-train phase was killed >700 s into `export_mesh` — this
probe attributes that wall: field-grid query (64 chunked dispatches +
D2H), host marching cubes / clean / decimate / UV unwrap (native C++),
UV rasterization compile+run, albedo field queries, EDT inpaint, OBJ
write.  Uses an untrained flagship state (the density blob provides a
real surface) — timing only, no quality claim.

Run on the TPU: python scripts/probe_export_cost.py [--resolution 256]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--tex_res", type=int, default=1024)
    ap.add_argument("--decimate", type=int, default=50_000)
    ap.add_argument("--workspace", default="/tmp/probe_export")
    args = ap.parse_args()

    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.training.trainer import Trainer
    from dreamfusion_tpu.mesh import export as ex

    t_all = time.time()
    cfg = finalize(Config(text="x", workspace=args.workspace,
                          backbone="triplane", seed=0, eval_interval=-1,
                          use_tensorboard=False))
    tr = Trainer(cfg, guidances={}, guidance_params={}, embeddings={})
    state = tr.init_state(jax.random.PRNGKey(0))
    print(f"[probe] init {time.time()-t_all:.1f}s", flush=True)

    # sacrificial tiny program (gotcha 9: first executable can hit ~100s)
    _ = float(jnp.sum(jnp.ones((8, 8))))

    times = {}

    t = time.time()
    sig = ex.query_grid(tr, state, args.resolution)
    times["query_grid"] = time.time() - t
    print(f"[probe] query_grid({args.resolution}^3) {times['query_grid']:.1f}s "
          f"finite={np.isfinite(sig).all()} max={sig.max():.3f}", flush=True)

    from dreamfusion_tpu.native import meshops
    thresh = min(2 * float(sig[sig > 1e-3].mean()) if (sig > 1e-3).any()
                 else cfg.density_thresh, cfg.density_thresh)
    t = time.time()
    verts, tris = meshops.marching_cubes(sig, float(thresh))
    times["marching_cubes"] = time.time() - t
    print(f"[probe] mcubes {times['marching_cubes']:.1f}s -> {len(verts)} v "
          f"{len(tris)} t", flush=True)
    verts = verts / (args.resolution - 1) * (2 * cfg.bound) - cfg.bound

    t = time.time()
    verts, tris = meshops.clean_mesh(verts, tris, weld_eps=1e-4 * cfg.bound,
                                     min_faces=8, min_frac=0.02)
    times["clean"] = time.time() - t
    t = time.time()
    if len(tris) > args.decimate:
        verts, tris = meshops.decimate_mesh(verts, tris, args.decimate)
    times["decimate"] = time.time() - t
    print(f"[probe] clean {times['clean']:.1f}s decimate "
          f"{times['decimate']:.1f}s -> {len(verts)} v {len(tris)} t",
          flush=True)

    t = time.time()
    verts, tris, uv, _src = meshops.unwrap_uv(
        np.asarray(verts, np.float32), np.asarray(tris, np.int32),
        atlas_res=args.tex_res)
    times["unwrap_uv"] = time.time() - t
    print(f"[probe] unwrap {times['unwrap_uv']:.1f}s -> {len(verts)} v",
          flush=True)

    # bake, instrumented
    from dreamfusion_tpu.ops.raster import rasterize, interpolate
    fn = ex._field_fn(tr, state, "albedo")
    u, v = uv[:, 0], uv[:, 1]
    clip = np.stack([u * 2 - 1, -(v * 2 - 1), np.zeros_like(u),
                     np.ones_like(u)], -1).astype(np.float32)
    faces = jnp.asarray(tris)
    t = time.time()
    out = rasterize(jnp.asarray(clip), faces,
                    jnp.ones((len(tris),), bool), args.tex_res, args.tex_res,
                    tile=32, tile_cap=min(1024, max(64, len(tris))),
                    soft_edge_px=0.0)
    _ = int(jnp.sum(out.tri_id >= 0))  # fence (block_until_ready lies here)
    times["rasterize_uv"] = time.time() - t
    t = time.time()
    xyz = interpolate(jnp.asarray(verts), out, faces)
    mask = np.asarray(out.tri_id >= 0)
    xyz = np.asarray(xyz).reshape(-1, 3)
    times["interpolate_fetch"] = time.time() - t
    print(f"[probe] rasterize {times['rasterize_uv']:.1f}s "
          f"interp+fetch {times['interpolate_fetch']:.1f}s "
          f"covered={mask.mean():.2%}", flush=True)

    t = time.time()
    flat = mask.reshape(-1)
    pts = xyz[flat]
    chunk = 512 * 512
    cols = np.empty((pts.shape[0], 3), np.float32)
    for i in range(0, pts.shape[0], chunk):
        end = min(i + chunk, pts.shape[0])
        buf = pts[i:end]
        pad_n = chunk - buf.shape[0]
        if pad_n > 0:
            buf = np.concatenate([buf, np.zeros((pad_n, 3), np.float32)])
        cols[i:end] = np.asarray(fn(jnp.asarray(buf)))[:end - i]
    times["albedo_query"] = time.time() - t
    n_chunks = -(-pts.shape[0] // chunk)
    print(f"[probe] albedo {times['albedo_query']:.1f}s "
          f"({pts.shape[0]} texels, {n_chunks} chunks)", flush=True)

    t = time.time()
    albedo = np.zeros_like(xyz)
    albedo[flat] = cols
    tex = albedo.reshape(args.tex_res, args.tex_res, 3)
    if (~mask).any() and mask.any():
        from scipy.ndimage import distance_transform_edt
        _, idx = distance_transform_edt(~mask, return_indices=True)
        tex = tex[idx[0], idx[1]]
    times["edt_inpaint"] = time.time() - t

    t = time.time()
    ex.write_obj(os.path.join(args.workspace, "mesh.obj"),
                 np.asarray(verts), np.asarray(tris), uv=uv,
                 texture=np.clip(tex, 0, 1))
    times["write_obj"] = time.time() - t

    times["total"] = time.time() - t_all
    print(json.dumps({k: round(v, 2) for k, v in times.items()}, indent=1))


if __name__ == "__main__":
    main()
