"""Triplane encoder: bilinear oracle, OOB zeros, progressive masking,
gradients, end-to-end train smoke on the triplane backbone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.ops.triplane import (TriplaneSpec, init_triplane,
                                          triplane_encode, triplane_tv_loss)


def numpy_bilinear(plane, u, v):
    """plane [R, R, C]; u, v scalars in [0,1] → [C] (row=u, col=v)."""
    R = plane.shape[0]
    pu, pv = u * (R - 1), v * (R - 1)
    i0, j0 = int(np.floor(pu)), int(np.floor(pv))
    i1, j1 = min(i0 + 1, R - 1), min(j0 + 1, R - 1)
    fu, fv = pu - i0, pv - j0
    return (plane[i0, j0] * (1 - fu) * (1 - fv) + plane[i0, j1] * (1 - fu) * fv
            + plane[i1, j0] * fu * (1 - fv) + plane[i1, j1] * fu * fv)


def test_matches_numpy_bilinear_oracle():
    spec = TriplaneSpec(resolution=16, channels=4, num_scales=1)
    planes = init_triplane(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (32, 3)).astype(np.float32)
    out = np.asarray(triplane_encode(jnp.asarray(x), planes, spec))
    pl = np.asarray(planes[0])
    for n in range(32):
        px, py, pz = x[n]
        expect = np.concatenate([
            numpy_bilinear(pl[0], px, py),
            numpy_bilinear(pl[1], px, pz),
            numpy_bilinear(pl[2], py, pz),
        ])
        np.testing.assert_allclose(out[n], expect, rtol=1e-5, atol=1e-6)


def test_oob_returns_zero_and_grads_finite():
    spec = TriplaneSpec(resolution=8, channels=2, num_scales=2)
    planes = init_triplane(jax.random.PRNGKey(1), spec)
    x = jnp.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]])
    out = triplane_encode(x, planes, spec)
    assert out.shape == (3, spec.output_dim)
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)
    np.testing.assert_array_equal(np.asarray(out[2]), 0.0)

    g = jax.grad(lambda p: triplane_encode(x, p, spec).sum())(planes)
    for leaf in g:
        assert np.isfinite(np.asarray(leaf)).all()
    gx = jax.grad(lambda xx: triplane_encode(xx, planes, spec).sum())(x)
    assert np.isfinite(np.asarray(gx)).all()


def test_progressive_masking_coarse_first():
    spec = TriplaneSpec(resolution=16, channels=2, num_scales=2)
    planes = init_triplane(jax.random.PRNGKey(2), spec)
    x = jnp.array([[0.3, 0.6, 0.7]])
    lo = np.asarray(triplane_encode(x, planes, spec,
                                    max_level=jnp.asarray(0.5)))
    full = np.asarray(triplane_encode(x, planes, spec,
                                      max_level=jnp.asarray(1.0)))
    C = 3 * spec.channels
    # at max_level 0.5 only the coarse scale (second block) is active
    np.testing.assert_array_equal(lo[:, :C], 0.0)
    assert np.abs(lo[:, C:]).max() > 0
    np.testing.assert_allclose(lo[:, C:], full[:, C:], rtol=1e-6)
    assert np.abs(full[:, :C]).max() > 0


def test_tv_loss_zero_for_constant_planes():
    spec = TriplaneSpec(resolution=8, channels=2, num_scales=1)
    planes = [jnp.ones((3, 8, 8, 2))]
    assert float(triplane_tv_loss(planes)) == 0.0
    planes2 = init_triplane(jax.random.PRNGKey(3), spec)
    assert float(triplane_tv_loss(planes2)) > 0.0


def test_train_loop_smoke_triplane(tmp_path):
    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
    from dreamfusion_tpu.training.trainer import Trainer

    g = StableDiffusionGuidance(SDConfig(tiny=True, image_size=16,
                                         latent_size=8))
    gparams = g.init_params(jax.random.PRNGKey(7))
    emb = prepare_text_embeddings(g, gparams, "a hamburger")
    cfg = finalize(Config(
        text="a hamburger", workspace=str(tmp_path / "ws"),
        backbone="triplane", w=16, h=16, iters=4, dataset_size_train=2,
        latent_iter_ratio=0.3, triplane_resolution=32, triplane_channels=4,
        grid_size=32, grid_coarse_steps=16, grid_fine_steps=16,
        hidden_dim=16, num_layers=2, hidden_dim_bg=8, num_layers_bg=2,
        update_extra_interval=2, fp16=False, eval_interval=-1, seed=0,
        lambda_3d_normal_smooth=0.0, lambda_tv=1e-4))
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    state = tr.init_state(jax.random.PRNGKey(0))
    tp0 = [np.asarray(p).copy()
           for p in state.params["field"]["triplanes"]]
    state = tr.train(state, max_steps=cfg.iters)
    assert int(state.step) == cfg.iters
    assert np.isfinite(float(tr.stats["loss"][-1]))
    moved = sum(float(np.abs(np.asarray(a) - b).sum()) for a, b in
                zip(state.params["field"]["triplanes"], tp0))
    assert moved > 0
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


# ---- analytic encoder jacobian (triplane_encode_with_xgrad) --------------

def _mk_field(compute_dtype=jnp.float32, scales=2):
    from dreamfusion_tpu.models.nerf import NeRFField
    # normal_mode='analytic' routes shading through common_with_normal
    # (the single-scatter path under test)
    return NeRFField(backbone="triplane", bound=1.0, hidden_dim=16,
                     num_layers=2, bg_radius=-1.0,
                     triplane_resolution=32, triplane_channels=4,
                     triplane_scales=scales, normal_mode="analytic",
                     compute_dtype=compute_dtype)


def test_xgrad_matches_autograd_jacobian():
    from dreamfusion_tpu.ops.triplane import triplane_encode_with_xgrad
    spec = TriplaneSpec(resolution=16, channels=3, num_scales=2)
    planes = init_triplane(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                           minval=0.02, maxval=0.98)
    feat, (jx, jy, jz) = triplane_encode_with_xgrad(x, planes, spec)
    jac = jnp.stack([jx, jy, jz], axis=-1)
    ref_feat = triplane_encode(x, planes, spec)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(ref_feat),
                               atol=1e-6, rtol=1e-6)
    ref_jac = jax.vmap(jax.jacrev(
        lambda p: triplane_encode(p[None], planes, spec)[0]))(x)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(ref_jac),
                               atol=1e-5, rtol=1e-4)


def test_analytic_normal_matches_autograd():
    field = _mk_field()
    x = jax.random.uniform(jax.random.PRNGKey(2), (128, 3),
                           minval=-0.9, maxval=0.9)
    params = field.init(jax.random.PRNGKey(3), x, method=field.density)["params"]

    sigma, albedo, normal = field.apply({"params": params}, x,
                                        method=field.common_with_normal)
    n_ref = field.apply({"params": params}, x, method=lambda m, xx: m._autograd_normal(xx, None))
    n_ref = jnp.nan_to_num(jax.vmap(lambda v: v / jnp.maximum(
        jnp.linalg.norm(v), 1e-20))(n_ref))
    d_ref = field.apply({"params": params}, x, method=field.density)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(d_ref["sigma"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(albedo), np.asarray(d_ref["albedo"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(normal), np.asarray(n_ref),
                               atol=1e-4, rtol=1e-3)


def test_analytic_normal_second_order_plane_grads_match():
    """d loss/d planes through the normals must equal the autograd-normal
    path (the analytic jacobian is exact, so outer AD of it is too)."""
    field = _mk_field()
    x = jax.random.uniform(jax.random.PRNGKey(4), (64, 3),
                           minval=-0.8, maxval=0.8)
    params = field.init(jax.random.PRNGKey(5), x, method=field.density)["params"]

    def loss_new(p):
        s, a, n = field.apply({"params": p}, x,
                              method=field.common_with_normal)
        return jnp.sum(s) + jnp.sum(n * n) + jnp.sum(a)

    def loss_old(p):
        def f(pp):
            s, a = field.apply({"params": pp}, x, method=field.common)
            return jnp.sum(s), (s, a)
        def n_of(pp):
            def sig_sum(pts):
                s, _ = field.apply({"params": pp}, pts, method=field.common)
                return jnp.sum(s)
            g = -jax.grad(sig_sum)(x)
            from dreamfusion_tpu.core.math import safe_normalize
            return jnp.nan_to_num(safe_normalize(g))
        s, a = field.apply({"params": p}, x, method=field.common)
        n = n_of(p)
        return jnp.sum(s) + jnp.sum(n * n) + jnp.sum(a)

    g_new = jax.grad(loss_new)(params)
    g_old = jax.grad(loss_old)(params)
    flat_new = jax.tree_util.tree_leaves(g_new)
    flat_old = jax.tree_util.tree_leaves(g_old)
    for a, b in zip(flat_new, flat_old):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


def test_lambertian_grad_compiles_to_one_scatter_per_scale():
    """HLO regression: the training backward through lambertian shading must
    emit exactly one plane scatter per scale (it was 4 before the analytic
    jacobian — see scripts/profile_step_scan.py T5 vs T6)."""
    field = _mk_field(scales=1)
    from dreamfusion_tpu.models.nerf import SHADING_IDS
    x = jax.random.uniform(jax.random.PRNGKey(6), (256, 3),
                           minval=-0.9, maxval=0.9)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), x.shape)
    params = field.init(jax.random.PRNGKey(7), x, method=field.density)["params"]

    def loss(p):
        s, c, n = field.apply({"params": p}, x, d, d, 0.5,
                              SHADING_IDS["lambertian"])
        return jnp.sum(s) + jnp.sum(c)

    txt = jax.jit(jax.grad(loss)).lower(params).as_text()
    n_scatter = txt.count('= "stablehlo.scatter"')
    assert n_scatter == 1, f"expected 1 plane scatter, got {n_scatter}"
