"""DMTet refinement-stage tests: sphere-init geometry, train step, lock_geo,
mesh extraction, rendering, checkpoint roundtrip, stage-1 bootstrap."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.config import Config, apply_dmtet, finalize
from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
from dreamfusion_tpu.training.dmtet_trainer import DMTetTrainer
from dreamfusion_tpu.training.trainer import Trainer


def dmtet_config(tmp_path, **kw):
    base = dict(
        text="a hamburger", workspace=str(tmp_path / "ws_dmtet"),
        backbone="grid", w=24, h=24, iters=4, dataset_size_train=2,
        dmtet=True, tet_grid_size=12, dmtet_reso_scale=1.0,
        latent_iter_ratio=0.0, albedo_iter_ratio=0.0, progressive_view=False,
        grid_levels=4, grid_log2_hashmap_size=8, grid_desired_resolution=64,
        grid_size=32, hidden_dim=16, num_layers=2,
        hidden_dim_bg=8, num_layers_bg=2,
        fp16=False, eval_interval=-1, seed=0, t_range=(0.02, 0.5),
        lambda_3d_normal_smooth=0.0,
    )
    base.update(kw)
    return finalize(Config(**base))


@pytest.fixture(scope="module")
def tiny_guidance():
    g = StableDiffusionGuidance(SDConfig(tiny=True, image_size=16,
                                         latent_size=8))
    params = g.init_params(jax.random.PRNGKey(7))
    emb = prepare_text_embeddings(g, params, "a hamburger")
    return g, params, emb


@pytest.fixture(scope="module")
def trainer_state(tmp_path_factory, tiny_guidance):
    g, gparams, emb = tiny_guidance
    tmp = tmp_path_factory.mktemp("dmtet")
    cfg = dmtet_config(tmp)
    tr = DMTetTrainer(cfg, guidances={"SD": g},
                      guidance_params={"SD": gparams},
                      embeddings={"SD": emb})
    state = tr.init_state(jax.random.PRNGKey(0))
    return tr, state


def test_sphere_init_extracts_sphere(trainer_state):
    tr, state = trainer_state
    verts, tris = tr.extract_dmtet_mesh(state)
    assert len(tris) > 20
    r = np.linalg.norm(verts, axis=1)
    # sphere radius 0.5 from init_params_sphere, coarse tet grid → loose tol
    np.testing.assert_allclose(r, 0.5, atol=0.12)


def test_render_eval_image(trainer_state):
    tr, state = trainer_state
    from dreamfusion_tpu.training.data import circle_view_batch
    batch = circle_view_batch(tr.cfg, 0, 4, tr.cfg.h, tr.cfg.w)
    img, depth = tr._render_view(state, batch, tr.cfg.h, tr.cfg.w)
    assert img.shape == (tr.cfg.h, tr.cfg.w, 3)
    assert np.isfinite(img).all() and img.min() >= -1e-4 and img.max() <= 1 + 1e-4
    # the sphere covers the center of the frame: center differs from bg
    c = img[tr.cfg.h // 2, tr.cfg.w // 2]
    corner = img[0, 0]
    assert not np.allclose(c, corner, atol=1e-3)


def test_train_moves_geometry_and_field(trainer_state):
    tr, state = trainer_state
    sdf0 = np.asarray(state.params["geo"]["sdf"]).copy()
    nerf0 = [np.asarray(l).copy()
             for l in jax.tree_util.tree_leaves(state.params["nerf"])]
    state2 = tr.train(state, max_steps=3)
    assert int(state2.step) == 3
    assert np.isfinite(float(tr.stats["loss"][-1]))
    assert np.abs(np.asarray(state2.params["geo"]["sdf"]) - sdf0).max() > 0
    # the texture field (MLP) moved too — some leaves (e.g. the unused
    # background net) legitimately stay put, so check the aggregate
    moved = sum(float(np.abs(np.asarray(a) - b).sum()) for a, b in
                zip(jax.tree_util.tree_leaves(state2.params["nerf"]), nerf0))
    assert moved > 0

    # checkpoint roundtrip with the DMTet state pytree
    tr.save_checkpoint(state2)
    template = tr.init_state(jax.random.PRNGKey(1))
    restored, ok = tr.load_checkpoint(template, "latest")
    assert ok
    np.testing.assert_allclose(np.asarray(restored.params["geo"]["sdf"]),
                               np.asarray(state2.params["geo"]["sdf"]))
    np.testing.assert_allclose(np.asarray(restored.tet_scale),
                               np.asarray(state2.tet_scale))


def test_lock_geo_freezes_geometry(tmp_path, tiny_guidance):
    g, gparams, emb = tiny_guidance
    cfg = dmtet_config(tmp_path, lock_geo=True)
    tr = DMTetTrainer(cfg, guidances={"SD": g},
                      guidance_params={"SD": gparams},
                      embeddings={"SD": emb})
    state = tr.init_state(jax.random.PRNGKey(0))
    sdf0 = np.asarray(state.params["geo"]["sdf"]).copy()
    deform0 = np.asarray(state.params["geo"]["deform"]).copy()
    state2 = tr.train(state, max_steps=2)
    np.testing.assert_array_equal(np.asarray(state2.params["geo"]["sdf"]),
                                  sdf0)
    np.testing.assert_array_equal(np.asarray(state2.params["geo"]["deform"]),
                                  deform0)


def test_bootstrap_from_stage1_checkpoint(tmp_path, tiny_guidance):
    """Stage-1 → DMTet handoff (reference main.py:317-329)."""
    g, gparams, emb = tiny_guidance
    cfg1 = finalize(Config(
        text="a hamburger", workspace=str(tmp_path / "ws1"),
        backbone="grid", w=16, h=16, iters=2, dataset_size_train=2,
        latent_iter_ratio=0.0, grid_levels=4, grid_log2_hashmap_size=8,
        grid_desired_resolution=64, grid_size=32,
        grid_coarse_steps=16, grid_fine_steps=16,
        hidden_dim=16, num_layers=2, hidden_dim_bg=8, num_layers_bg=2,
        fp16=False, eval_interval=-1, seed=0, lambda_3d_normal_smooth=0.0))
    tr1 = Trainer(cfg1, guidances={"SD": g}, guidance_params={"SD": gparams},
                  embeddings={"SD": emb})
    s1 = tr1.init_state(jax.random.PRNGKey(0))
    s1 = tr1.train(s1, max_steps=2)
    tr1.save_checkpoint(s1)

    cfg2 = dmtet_config(tmp_path, workspace=str(tmp_path / "ws2"))
    tr2 = DMTetTrainer(cfg2, guidances={"SD": g},
                       guidance_params={"SD": gparams},
                       embeddings={"SD": emb})
    ckpt_dir = os.path.join(cfg1.workspace, "checkpoints")
    state = tr2.init_state(jax.random.PRNGKey(0), nerf_ckpt=ckpt_dir)
    # field params came from the stage-1 EMA
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state.params["nerf"])[0]),
        np.asarray(jax.tree_util.tree_leaves(s1.ema_params)[0]), rtol=1e-6)
    # density-blob init ⇒ sdf positive near the origin
    grid = tr2.dmtet_renderer.grid
    center = np.linalg.norm(grid.vertices, axis=1) < 0.15
    assert center.any()
    sdf = np.asarray(state.params["geo"]["sdf"])
    assert sdf[center].mean() > 0
    # tet_scale positive and finite
    ts = np.asarray(state.tet_scale)
    assert (ts > 0).all() and np.isfinite(ts).all()

    # one train step runs
    state = tr2.train(state, max_steps=1)
    assert np.isfinite(float(tr2.stats["loss"][-1]))


def test_image_conditioned_dmtet(tmp_path, tiny_guidance):
    """--image + --dmtet: zero123-style known-view step through the
    rasterizer (reference supports dmtet refinement of image runs)."""
    import numpy as np_
    from PIL import Image

    from dreamfusion_tpu.training.image_data import load_ref_images

    g, gparams, emb = tiny_guidance
    rgba = np_.zeros((32, 32, 4), np_.uint8)
    rgba[8:24, 8:24] = (200, 60, 60, 255)
    p = str(tmp_path / "ref_rgba.png")
    Image.fromarray(rgba).save(p)

    cfg = dmtet_config(tmp_path, image=p, known_view_interval=2, iters=4,
                       known_view_scale=1.0)
    ref = load_ref_images(cfg, cfg.h, cfg.w)
    tr = DMTetTrainer(cfg, guidances={"SD": g},
                      guidance_params={"SD": gparams},
                      embeddings={"SD": emb}, ref_images=ref)
    state = tr.init_state(jax.random.PRNGKey(0))
    # steps 0 and 2 are known-view steps, 1 and 3 SDS steps
    state = tr.train(state, max_steps=4)
    assert int(state.step) == 4
    assert np.isfinite(float(tr.stats["loss"][-1]))
    assert np.isfinite(np.asarray(state.params["geo"]["sdf"])).all()


def test_normal_consistency_no_key_overflow():
    """Edge pairing must be exact for vertex counts where lo*E+hi would
    overflow int32 (real tet grids have ~2M edge slots)."""
    import jax.numpy as jnp
    from dreamfusion_tpu.ops.marching_tets import (TetMesh,
                                                   normal_consistency_loss)

    E = 3_000_000            # big vertex id space
    # two coplanar triangles sharing edge (a, b) placed at HUGE vertex ids,
    # plus padding — with int32 overflow their keys would not match
    a, b, c, d = E - 2, E - 1, 0, 1
    verts = jnp.zeros((E, 3)).at[a].set([0, 0, 0]).at[b].set([1, 0, 0]) \
        .at[c].set([0, 1, 0]).at[d].set([1, -1, 0])
    faces = jnp.array([[a, b, c], [b, a, d], [0, 0, 0], [0, 0, 0]],
                      jnp.int32)
    mask = jnp.array([True, True, False, False])
    mesh = TetMesh(verts=verts, vert_valid=jnp.ones((E,), bool),
                   faces=faces, face_mask=mask)
    # coplanar same-winding-across-edge normals → cos=±1; loss finite and
    # pairing found exactly one shared edge (loss == 1 - cos in [0, 2])
    loss = float(normal_consistency_loss(mesh))
    import numpy as np_
    assert np_.isfinite(loss)
    # the two triangles are coplanar with opposite orientation conventions;
    # what matters: a pair WAS found (loss != 0 fallback of "no pairs")
    # and no spurious pairs from overflowed keys
    assert 0.0 <= loss <= 2.0


# ---------------------------------------------------------------------------
# mesh-file init (--dmtet --init_with mesh.obj; reference renderer.py:817-836)
# ---------------------------------------------------------------------------

def _uv_sphere_obj(path, radius=1.0, n_theta=12, n_phi=18):
    """Write a watertight UV-sphere OBJ."""
    lines = []
    verts = [(0.0, 0.0, radius)]
    for i in range(1, n_theta):
        th = np.pi * i / n_theta
        for j in range(n_phi):
            ph = 2 * np.pi * j / n_phi
            verts.append((radius * np.sin(th) * np.cos(ph),
                          radius * np.sin(th) * np.sin(ph),
                          radius * np.cos(th)))
    verts.append((0.0, 0.0, -radius))
    for x, y, z in verts:
        lines.append(f"v {x} {y} {z}")

    def ring(i, j):  # 1-based OBJ index of ring i (1..n_theta-1), col j
        return 2 + (i - 1) * n_phi + (j % n_phi)

    for j in range(n_phi):  # top cap
        lines.append(f"f 1 {ring(1, j)} {ring(1, j + 1)}")
    for i in range(1, n_theta - 1):
        for j in range(n_phi):
            a, b = ring(i, j), ring(i, j + 1)
            c, d = ring(i + 1, j), ring(i + 1, j + 1)
            lines.append(f"f {a} {c} {d}")
            lines.append(f"f {a} {d} {b}")
    bot = len(verts)
    for j in range(n_phi):  # bottom cap
        lines.append(f"f {bot} {ring(n_theta - 1, j + 1)} "
                     f"{ring(n_theta - 1, j)}")
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_signed_distance_sphere(tmp_path):
    """mesh/sdf.py signed_distance vs the analytic sphere SDF (positive
    outside), through the OBJ loader."""
    from dreamfusion_tpu.mesh.sdf import load_obj, signed_distance
    obj = tmp_path / "sphere.obj"
    _uv_sphere_obj(obj, radius=0.5, n_theta=16, n_phi=24)
    v, t = load_obj(str(obj))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.9, 0.9, (256, 3)).astype(np.float32)
    sd = np.asarray(signed_distance(jnp.asarray(pts), jnp.asarray(v),
                                    jnp.asarray(t), chunk=64))
    ref = np.linalg.norm(pts, axis=-1) - 0.5
    # faceted sphere ⇒ small bias vs the smooth SDF; signs must agree
    # away from the surface and distances within the facet sag
    away = np.abs(ref) > 0.05
    assert np.all(np.sign(sd[away]) == np.sign(ref[away]))
    np.testing.assert_allclose(sd, ref, atol=0.03)


def test_dmtet_init_from_mesh_obj(tmp_path, tiny_guidance):
    """VERDICT r4 item 5: sphere OBJ in → DMTet starts as a sphere (sdf
    sign field matches the analytic ball; extracted surface at the right
    radius) with NO NeRF checkpoint."""
    g, gparams, emb = tiny_guidance
    obj = tmp_path / "init_sphere.obj"
    _uv_sphere_obj(obj, radius=1.0, n_theta=14, n_phi=20)
    cfg = dmtet_config(tmp_path, init_with=str(obj),
                       workspace=str(tmp_path / "ws_meshinit"))
    tr = DMTetTrainer(cfg, guidances={"SD": g},
                      guidance_params={"SD": gparams},
                      embeddings={"SD": emb})
    state = tr.init_state(jax.random.PRNGKey(0))
    geo = state.params["geo"]
    # normalized mesh: extent 0.8 → radius 0.4; tet_scale 0.5
    np.testing.assert_allclose(np.asarray(state.tet_scale),
                               0.5 * np.ones(3), atol=0.02)
    tet_v = np.asarray(tr.dmtet_renderer.grid.vertices) * \
        np.asarray(state.tet_scale)
    r = np.linalg.norm(tet_v, axis=-1)
    sdf = np.asarray(geo["sdf"])
    inside, outside = r < 0.34, r > 0.46
    assert np.mean(sdf[inside] > 0) > 0.98     # inner positive
    assert np.mean(sdf[outside] < 0) > 0.98
    # extracted marching-tets surface sits at the sphere radius
    from dreamfusion_tpu.models.dmtet import DMTetParams
    mesh = tr.dmtet_renderer.extract_mesh(DMTetParams(
        sdf=geo["sdf"], deform=geo["deform"], tet_scale=state.tet_scale))
    sv = np.asarray(mesh.verts)[np.asarray(mesh.vert_valid)]
    assert len(sv) > 50
    rad = np.linalg.norm(sv, axis=-1)
    assert abs(float(np.median(rad)) - 0.4) < 0.05


def test_ply_loader_typed_properties(tmp_path):
    """Binary-LE PLY with uchar colors interleaved (typical scanner/
    MeshLab output) must parse via the typed property table; a truncated
    header must raise, not hang (ADVICE r5 self-review)."""
    import struct

    from dreamfusion_tpu.mesh.sdf import load_mesh

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                     np.float32)
    tris = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    p = tmp_path / "colored.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 4\n")
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\n"
                b"property uchar blue\n")
        f.write(b"element face 4\n")
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        for v in verts:
            f.write(struct.pack("<fffBBB", *v, 255, 128, 0))
        for t in tris:
            f.write(struct.pack("<Biii", 3, *t))
    v, t = load_mesh(str(p))
    np.testing.assert_allclose(v, verts)
    np.testing.assert_array_equal(t, tris)

    bad = tmp_path / "truncated.ply"
    bad.write_bytes(b"ply\nformat binary_little_endian 1.0\n"
                    b"element vertex 4\n")
    with pytest.raises(ValueError, match="EOF"):
        load_mesh(str(bad))
