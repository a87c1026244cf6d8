"""Native meshops + textured export pipeline tests.

Oracles: analytic sphere surface (marching cubes correctness = watertight,
Euler characteristic 2, vertices on the isosurface, outward winding);
quadric decimation must preserve the surface; the full export writes a
valid OBJ/MTL/PNG whose baked texture matches the field's albedo.
"""

import os
from collections import Counter

import numpy as np
import pytest

from dreamfusion_tpu.native import meshops


def sphere_grid(n=40, radius=0.6):
    xs = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(xs, xs, xs, indexing="ij")
    return (10.0 * (radius - np.sqrt(x**2 + y**2 + z**2))).astype(np.float32)


def edge_counts(tris):
    e = Counter()
    for a, b, c in tris:
        for p, q in ((a, b), (b, c), (c, a)):
            e[(min(p, q), max(p, q))] += 1
    return e


class TestMarchingCubes:
    def test_sphere_watertight_euler_and_isosurface(self):
        n, radius = 40, 0.6
        v, t = meshops.marching_cubes(sphere_grid(n, radius), 0.0)
        assert len(t) > 100
        e = edge_counts(t)
        assert set(e.values()) == {2}, "every edge shared by exactly 2 faces"
        assert len(v) - len(e) + len(t) == 2, "Euler characteristic of S²"
        w = v / (n - 1) * 2 - 1
        r = np.linalg.norm(w, axis=1)
        np.testing.assert_allclose(r, radius, atol=2.5 / n)

    def test_outward_winding(self):
        n = 32
        v, t = meshops.marching_cubes(sphere_grid(n), 0.0)
        w = v / (n - 1) * 2 - 1
        p0, p1, p2 = w[t[:, 0]], w[t[:, 1]], w[t[:, 2]]
        nrm = np.cross(p1 - p0, p2 - p0)
        ctr = (p0 + p1 + p2) / 3
        assert (np.sum(nrm * ctr, axis=1) > 0).all()

    def test_empty_and_full_grids(self):
        g = np.full((8, 8, 8), -1.0, np.float32)
        v, t = meshops.marching_cubes(g, 0.0)
        assert len(v) == 0 and len(t) == 0
        v, t = meshops.marching_cubes(-g, 0.0)  # all inside: no boundary cells crossing
        e = edge_counts(t)
        assert not e or set(e.values()) == {2}


class TestSigmasToMesh:
    def test_noise_field_guard_downsamples_and_finishes(self):
        """A diverged/random field is a 3D noise surface — tens of millions
        of raw MC triangles at 256³ (the r4 flagship export ground for
        849 s on one).  sigmas_to_mesh must estimate the surface cheaply,
        extract at a reduced resolution, and return a bounded mesh in
        seconds instead."""
        import time

        from dreamfusion_tpu.mesh.export import sigmas_to_mesh

        rng = np.random.default_rng(0)
        sig = rng.uniform(0.0, 20.0, (128, 128, 128)).astype(np.float32)
        sig[rng.uniform(size=sig.shape) < 0.1] = np.inf  # diverged cells
        msgs = []
        t0 = time.time()
        v, t = sigmas_to_mesh(sig, 10.0, 1.0, decimate_target=10_000,
                              log=msgs.append)
        wall = time.time() - t0
        assert any("degenerate surface" in m for m in msgs), msgs
        assert len(t) <= 10_000 * 1.1
        assert np.isfinite(v).all()
        # quadric decimation's optimal vertex placement may drift a hair
        # outside the lattice hull
        assert np.abs(v).max() <= 1.05
        assert wall < 120, f"guarded degenerate export took {wall:.0f}s"

    def test_sphere_field_untouched_by_guard(self):
        """A real object's surface never trips the guard: full-resolution
        extraction, same mesh as calling the native ops directly."""
        from dreamfusion_tpu.mesh.export import sigmas_to_mesh

        sig = sphere_grid(64, 0.6)
        msgs = []
        v, t = sigmas_to_mesh(sig, 0.0, 1.0, decimate_target=0,
                              clean=False, log=msgs.append)
        assert not msgs
        v2, t2 = meshops.marching_cubes(sig, 0.0)
        assert len(t) == len(t2)
        r = np.linalg.norm(v, axis=1)
        np.testing.assert_allclose(r, 0.6, atol=0.05)


class TestCleanDecimate:
    def test_clean_removes_small_components_and_welds(self):
        # big sphere + tiny far-away triangle
        n = 32
        v, t = meshops.marching_cubes(sphere_grid(n), 0.0)
        w = (v / (n - 1) * 2 - 1).astype(np.float32)
        extra_v = np.array([[5, 5, 5], [5.1, 5, 5], [5, 5.1, 5],
                            [5, 5, 5]], np.float32)  # last = duplicate of first
        extra_t = np.array([[0, 1, 2], [3, 1, 2]], np.int32) + len(w)
        verts = np.concatenate([w, extra_v])
        tris = np.concatenate([t, extra_t])
        cv, ct = meshops.clean_mesh(verts, tris, weld_eps=1e-4,
                                    min_faces=8, min_frac=0.0)
        assert len(ct) == len(t)               # island removed
        assert np.abs(cv).max() < 1.5          # island verts gone

    def test_decimate_preserves_sphere(self):
        n = 40
        v, t = meshops.marching_cubes(sphere_grid(n), 0.0)
        w = (v / (n - 1) * 2 - 1).astype(np.float32)
        dv, dt = meshops.decimate_mesh(w, t, len(t) // 5)
        assert len(dt) <= len(t) // 5 + 8
        r = np.linalg.norm(dv, axis=1)
        np.testing.assert_allclose(r, 0.6, atol=0.03)
        # still closed
        assert set(edge_counts(dt).values()) == {2}


class TestUnwrap:
    def test_uv_in_bounds_faces_preserved_src_valid(self):
        n = 32
        v, t = meshops.marching_cubes(sphere_grid(n), 0.0)
        w = (v / (n - 1) * 2 - 1).astype(np.float32)
        uv_v, uv_t, uv, src = meshops.unwrap_uv(w, t, atlas_res=512)
        assert len(uv_t) == len(t)
        assert uv.min() >= 0.0 and uv.max() <= 1.0
        assert src.min() >= 0 and src.max() < len(w)
        # duplicated verts carry their source position
        np.testing.assert_allclose(uv_v, w[src], atol=0)

    def test_charts_do_not_overlap(self):
        """Rasterize the atlas at low res; each texel must be covered by
        faces of at most one chart (approximately — shared borders allowed)."""
        n = 24
        v, t = meshops.marching_cubes(sphere_grid(n), 0.0)
        w = (v / (n - 1) * 2 - 1).astype(np.float32)
        uv_v, uv_t, uv, src = meshops.unwrap_uv(w, t, atlas_res=256)
        # recover chart ids: output verts are duplicated per chart, so
        # connected components of the output mesh = charts
        parent = np.arange(len(uv_v))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for f in uv_t:
            ra, rb, rc = find(f[0]), find(f[1]), find(f[2])
            parent[rb] = ra
            parent[rc] = ra
        chart_of_face = np.array([find(f[0]) for f in uv_t])

        res = 128
        owner = -np.ones((res, res), np.int64)
        overlaps = 0
        for fi, f in enumerate(uv_t):
            ci = chart_of_face[fi]
            pts = uv[f] * res
            lo = np.floor(pts.min(0)).astype(int).clip(0, res - 1)
            hi = np.ceil(pts.max(0)).astype(int).clip(0, res - 1)
            for ix in range(lo[0], hi[0] + 1):
                for iy in range(lo[1], hi[1] + 1):
                    p = np.array([ix + 0.5, iy + 0.5])
                    d = pts[1:] - pts[0]
                    det = d[0, 0] * d[1, 1] - d[0, 1] * d[1, 0]
                    if abs(det) < 1e-12:
                        continue
                    rel = p - pts[0]
                    b1 = (rel[0] * d[1, 1] - rel[1] * d[1, 0]) / det
                    b2 = (-rel[0] * d[0, 1] + rel[1] * d[0, 0]) / det
                    if b1 < -0.05 or b2 < -0.05 or b1 + b2 > 1.05:
                        continue
                    if owner[ix, iy] >= 0 and owner[ix, iy] != ci:
                        overlaps += 1
                    owner[ix, iy] = ci
        covered = (owner >= 0).sum()
        assert covered > 100
        assert overlaps / covered < 0.05   # charts land in disjoint rects


class TestExportPipeline:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        import jax
        from dreamfusion_tpu.config import Config, finalize
        from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
        from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
        from dreamfusion_tpu.training.trainer import Trainer

        tmp = tmp_path_factory.mktemp("export")
        g = StableDiffusionGuidance(SDConfig(tiny=True, image_size=16,
                                             latent_size=8))
        gparams = g.init_params(jax.random.PRNGKey(7))
        emb = prepare_text_embeddings(g, gparams, "a hamburger")
        cfg = finalize(Config(
            text="a hamburger", workspace=str(tmp / "ws"),
            backbone="vanilla", w=16, h=16, iters=2, dataset_size_train=2,
            latent_iter_ratio=0.0, num_steps=12, upsample_steps=0,
            hidden_dim=16, num_layers=2, hidden_dim_bg=8, num_layers_bg=2,
            fp16=False, eval_interval=-1, seed=0,
            lambda_3d_normal_smooth=0.0))
        tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                     embeddings={"SD": emb})
        state = tr.init_state(jax.random.PRNGKey(0))
        return tr, state, tmp

    def test_extract_and_export_obj(self, trained):
        from dreamfusion_tpu.mesh.export import export_mesh, read_obj

        tr, state, tmp = trained
        # the density blob guarantees a surface at init
        path = export_mesh(tr, state, str(tmp / "mesh"), resolution=48,
                           decimate_target=2000, tex_res=256)
        assert path and os.path.exists(path)
        base = os.path.splitext(path)[0]
        assert os.path.exists(base + ".mtl")
        assert os.path.exists(base + "_albedo.png")

        v, t, uv, tex = read_obj(path)
        assert len(v) > 10 and len(t) > 10
        assert uv is not None and uv.min() >= -1e-5 and uv.max() <= 1 + 1e-5
        assert tex is not None and os.path.exists(tex)
        # vertices stay near the query cube [-bound, bound]³ (quadric-
        # optimal collapse targets may drift ~1% outside)
        assert np.abs(v).max() <= tr.cfg.bound * 1.05

    def test_baked_texture_matches_field_albedo(self, trained):
        import jax
        import jax.numpy as jnp
        from dreamfusion_tpu.mesh.export import (bake_texture, extract_mesh)

        tr, state, _ = trained
        verts, tris = extract_mesh(tr, state, resolution=40,
                                   decimate_target=0, clean=True)
        assert len(tris) > 0
        uv_v, uv_t, uv, src = meshops.unwrap_uv(verts, tris, atlas_res=128)
        tex = bake_texture(tr, state, uv_v, uv_t, uv, tex_res=128)
        assert tex.shape == (128, 128, 3)
        assert np.isfinite(tex).all() and tex.min() >= 0 and tex.max() <= 1

        # sample a few vertices: texture at their uv ≈ albedo at their xyz
        params = state.ema_params
        albedo = np.asarray(tr.renderer.apply(
            {"params": params}, jnp.asarray(uv_v[:16]),
            method=tr.renderer.density)["albedo"])
        px = np.clip((uv[:16] * 128).astype(int), 0, 127)
        baked = tex[px[:, 1], px[:, 0]]   # texture rows = v, cols = u
        # loose tolerance: texel grid quantization
        assert np.abs(baked - albedo).mean() < 0.15


def test_extract_mesh_faint_field_fallback(monkeypatch, tmp_path):
    """A fully-faint field (every cell below density_thresh — RUN_r05's
    random-SD run pushed everything transparent) must still export the
    densest iso-surface instead of an empty mesh."""
    import dreamfusion_tpu.mesh.export as E

    class FakeTrainer:
        class cfg:
            bound = 1.0
            density_thresh = 10.0
        log = staticmethod(print)

    s = np.zeros((32, 32, 32), np.float32)
    xs = np.linspace(-1, 1, 32)
    r = np.sqrt(((np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1))
                 ** 2).sum(-1))
    s[r < 0.5] = 0.05          # far below thresh 10, but a real ball
    monkeypatch.setattr(E, "query_grid",
                        lambda tr, st, resolution=256, chunk=0: s)
    verts, tris = E.extract_mesh(FakeTrainer(), None, resolution=32)
    assert len(tris) > 0
    rad = np.linalg.norm(verts, axis=-1)
    assert abs(float(np.median(rad)) - 0.5) < 0.1
