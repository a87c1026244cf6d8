"""Compositing + renderer integration tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.models.nerf import SHADING_IDS
from dreamfusion_tpu.models.renderer import NeRFRenderer, RenderFlags
from dreamfusion_tpu.ops.composite import apply_background, composite_rays, compute_deltas
from dreamfusion_tpu.ops.occupancy import (
    march_rays_occupancy, occupancy_lookup, update_density_grid,
)
from dreamfusion_tpu.core.sampling import near_far_from_bound


# ---------------- compositing vs numpy cumprod oracle ----------------

def test_composite_oracle(rng):
    R, S = 4, 16
    sigmas = rng.uniform(0, 3, (R, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (R, S, 3)).astype(np.float32)
    z = np.sort(rng.uniform(1, 3, (R, S)).astype(np.float32), axis=-1)
    deltas = np.concatenate([np.diff(z, axis=-1),
                             np.full((R, 1), 0.1, np.float32)], -1)

    out = composite_rays(jnp.asarray(sigmas), jnp.asarray(rgbs),
                         jnp.asarray(z), jnp.asarray(deltas))

    alphas = 1 - np.exp(-sigmas * deltas)
    shifted = np.concatenate([np.ones((R, 1)), 1 - alphas + 1e-15], -1)
    weights = alphas * np.cumprod(shifted, -1)[:, :-1]
    np.testing.assert_allclose(np.asarray(out.weights), weights, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.image),
                               (weights[..., None] * rgbs).sum(1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), (weights * z).sum(1),
                               atol=1e-5)


def test_composite_mask_zeroes_padding(rng):
    R, S = 2, 8
    sigmas = jnp.ones((R, S)) * 10.0
    rgbs = jnp.ones((R, S, 3))
    z = jnp.broadcast_to(jnp.linspace(1, 2, S), (R, S))
    deltas = compute_deltas(z, 0.1)
    mask = jnp.zeros((R, S), bool)
    out = composite_rays(sigmas, rgbs, z, deltas, mask=mask)
    assert float(out.weights_sum.max()) == 0.0
    img = apply_background(out.image, out.weights_sum, jnp.ones(3))
    np.testing.assert_allclose(np.asarray(img), 1.0, atol=1e-6)


def test_composite_grad_matches_fd(rng):
    R, S = 2, 6
    sigmas = jnp.asarray(rng.uniform(0.1, 2, (R, S)).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(0, 1, (R, S, 3)).astype(np.float32))
    z = jnp.broadcast_to(jnp.linspace(1, 2, S), (R, S))
    deltas = compute_deltas(z, 0.15)

    def loss(s):
        o = composite_rays(s, rgbs, z, deltas)
        return jnp.sum(o.image) + jnp.sum(o.depth) + jnp.sum(o.weights_sum)

    g = jax.grad(loss)(sigmas)
    eps = 1e-3
    s2 = sigmas.at[0, 2].add(eps)
    s3 = sigmas.at[0, 2].add(-eps)
    fd = (loss(s2) - loss(s3)) / (2 * eps)
    np.testing.assert_allclose(fd, g[0, 2], rtol=1e-2)


# ---------------- occupancy ----------------

def test_occupancy_lookup_single_cascade():
    G = 16
    occ = jnp.zeros((1, G, G, G), bool).at[0, 8:, :, :].set(True)
    pts = jnp.array([[0.5, 0.0, 0.0], [-0.5, 0.0, 0.0], [2.0, 0.0, 0.0]])
    got = np.asarray(occupancy_lookup(occ, pts, bound=1.0))
    assert got.tolist() == [True, False, False]  # x>=0 occupied; OOB False


def test_march_resample_concentrates(key):
    G = 16
    occ = jnp.zeros((1, G, G, G), bool).at[0, :, :, 8:].set(True)  # z >= 0
    ro = jnp.array([[0.0, 0.0, 3.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])
    near, far = near_far_from_bound(ro, rd, 1.0, kind="cube")
    m = march_rays_occupancy(key, ro, rd, near, far, occ, 1.0,
                             n_probe=32, n_fine=32, perturb=True)
    pts_z = 3.0 - np.asarray(m.z_vals[0])
    # most fine samples should land in the occupied half-space z in [0, 1]
    assert (pts_z >= -0.1).mean() > 0.9


def test_update_density_grid(key):
    def density_fn(x):
        return jnp.where(jnp.linalg.norm(x, axis=-1) < 0.5, 100.0, 0.0)

    grid = jnp.zeros((1, 32 ** 3))
    new, mean_d, occ = update_density_grid(
        key, grid, density_fn, bound=1.0, grid_size=32)
    occ = np.asarray(occ[0])
    c = 32 // 2
    assert occ[c, c, c]            # center occupied
    assert not occ[0, 0, 0]        # corner empty
    assert float(mean_d) > 0
    # EMA: a second update with zero density decays but keeps max
    new2, _, _ = update_density_grid(
        key, new, lambda x: jnp.zeros(x.shape[0]), bound=1.0, grid_size=32)
    assert float(new2.max()) == pytest.approx(float(new.max()) * 0.95, rel=1e-5)


# ---------------- full renderer ----------------

def _tiny_renderer(backbone):
    return NeRFRenderer(
        backbone=backbone, bound=1.0, bg_radius=1.4,
        num_steps=16, upsample_steps=8,
        grid_probe_steps=16, grid_fine_steps=16,
        hidden_dim=16, num_layers=2, hidden_dim_bg=8, num_layers_bg=2,
        grid_levels=4, grid_log2_hashmap_size=8, grid_desired_resolution=64,
        compute_dtype=jnp.float32,
    )


@pytest.mark.parametrize("backbone", ["vanilla", "grid"])
def test_render_shapes_and_finite(backbone, key):
    from dreamfusion_tpu.core.poses import circle_poses
    from dreamfusion_tpu.core.rays import get_rays, intrinsics_from_fov

    model = _tiny_renderer(backbone)
    poses, _ = circle_poses(jnp.array([3.2]), jnp.array([90.0]), jnp.array([0.0]))
    H = W = 8
    intr = intrinsics_from_fov(jnp.asarray(20.0), H, W)
    ro, rd = get_rays(poses, intr, H, W)
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)

    occ = jnp.ones((1, 16, 16, 16), bool) if backbone == "grid" else None
    flags = RenderFlags(perturb=True, need_loss_orient=True,
                        need_normal_image=True)
    variables = model.init(
        {"params": key, "render": key}, flags, ro, rd, occ_grid=occ,
        shading=SHADING_IDS["lambertian"], ambient_ratio=0.5,
        method=model.render)
    out = model.apply(variables, flags, ro, rd, occ_grid=occ,
                      shading=SHADING_IDS["lambertian"], ambient_ratio=0.5,
                      rngs={"render": key}, method=model.render)
    assert out["image"].shape == (64, 3)
    assert out["depth"].shape == (64,)
    assert out["weights_sum"].shape == (64,)
    assert "loss_orient" in out and "normal_image" in out
    for v in jax.tree_util.tree_leaves(out):
        assert np.all(np.isfinite(np.asarray(v)))
    im = np.asarray(out["image"])
    assert im.min() >= -1e-4 and im.max() <= 1.0 + 1e-4


def test_render_grad_flows(key):
    model = _tiny_renderer("vanilla")
    ro = jnp.array([[0.0, 0.0, 3.2]] * 4)
    rd = jnp.array([[0.0, 0.0, -1.0]] * 4)
    flags = RenderFlags(perturb=False, shading_static_albedo=True)
    variables = model.init({"params": key, "render": key}, flags, ro, rd,
                           method=model.render)

    def loss(v):
        out = model.apply(v, flags, ro, rd, method=model.render)
        return jnp.mean(out["image"] ** 2) + jnp.mean(out["weights_sum"])

    g = jax.grad(loss)(variables)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_dt_gamma_geometric_probe_spacing():
    """dt_gamma > 0 spaces probe intervals geometrically (reference cone
    stepping, raymarching.cu:402-417): later deltas strictly larger."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dreamfusion_tpu.ops.occupancy import march_rays_occupancy

    ro = jnp.zeros((4, 3)) + jnp.array([0.0, 0.0, 3.2])
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
    near = jnp.full((4, 1), 0.1)
    far = jnp.full((4, 1), 6.0)
    occ = jnp.ones((1, 32, 32, 32), bool)
    out_u = march_rays_occupancy(None, ro, rd, near, far, occ, 1.0,
                                 n_probe=32, n_fine=16, mode="mask")
    out_g = march_rays_occupancy(None, ro, rd, near, far, occ, 1.0,
                                 n_probe=32, n_fine=16, mode="mask",
                                 dt_gamma=0.1)
    du = np.asarray(out_u.deltas[0])
    dg = np.asarray(out_g.deltas[0])
    np.testing.assert_allclose(du, du[0], rtol=1e-5)      # uniform
    assert (np.diff(dg) > 0).all()                         # growing steps
    np.testing.assert_allclose(dg[1:] / dg[:-1], 1.1, rtol=1e-4)
    # both cover [near, far]
    np.testing.assert_allclose(du.sum(), 5.9, rtol=1e-5)
    np.testing.assert_allclose(dg.sum(), 5.9, rtol=1e-5)


def test_grid_path_use_bg_net_routes_and_trains_bg_mlp(key):
    """Regression: render_grid must forward use_bg_net so the per-step
    bg-MLP-vs-random-color choice (reference nerf/utils.py:529-534) also
    works on the occupancy path, and the bg net receives gradient."""
    model = _tiny_renderer("grid")
    ro = jnp.array([[0.0, 0.0, 3.2]] * 4)
    rd = jnp.array([[0.05, 0.0, -1.0]] * 4)
    occ = jnp.ones((1, 16, 16, 16), bool)
    flags = RenderFlags(perturb=False, shading_static_albedo=True)
    bg = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), ro.shape)
    variables = model.init({"params": key, "render": key}, flags, ro, rd,
                           occ_grid=occ, bg_color=bg,
                           use_bg_net=jnp.asarray(False), method=model.render)

    def img(use_net):
        return model.apply(variables, flags, ro, rd, occ_grid=occ,
                           bg_color=bg, use_bg_net=jnp.asarray(use_net),
                           method=model.render)["image"]

    # with an untrained field the render is background-dominated; switching
    # the bg source must change the image
    assert not np.allclose(np.asarray(img(True)), np.asarray(img(False)))

    def loss(v):
        out = model.apply(v, flags, ro, rd, occ_grid=occ, bg_color=bg,
                          use_bg_net=jnp.asarray(True), method=model.render)
        return jnp.mean(out["image"] ** 2)

    g = jax.grad(loss)(variables)["params"]["field"]
    bg_leaves = [v for k, v in jax.tree_util.tree_flatten_with_path(g)[0]
                 if "bg" in jax.tree_util.keystr(k)]
    assert bg_leaves, "no bg params found"
    assert sum(float(jnp.abs(x).sum()) for x in bg_leaves) > 0


def test_update_density_grid_recovers_from_inf(key):
    """One divergent step producing inf sigma must not poison the grid
    forever: EMA-max can't decay inf (inf*0.95=inf), so update_density_grid
    sanitizes both the fresh queries and the carried grid (VERDICT r3 #3;
    reference mirror nerf/renderer.py:1102-1149 has no such guard and the
    round-3 flagship logged mean_density=inf for 10k steps)."""
    grid = jnp.zeros((1, 16 ** 3))

    def inf_density(x):
        return jnp.full((x.shape[0],), jnp.inf)

    poisoned, mean_d, _ = update_density_grid(
        key, grid, inf_density, bound=1.0, grid_size=16)
    assert np.isfinite(float(mean_d)), "mean_density must stay finite"
    assert np.isfinite(np.asarray(poisoned)).all()

    # a grid poisoned by an OLD (pre-guard) run also recovers: feed an
    # inf-carrying grid through one zero-density update
    stale = grid.at[0, 0].set(jnp.inf)
    recovered, mean_d2, _ = update_density_grid(
        key, stale, lambda x: jnp.zeros(x.shape[0]), bound=1.0, grid_size=16)
    assert np.isfinite(np.asarray(recovered)).all()
    assert np.isfinite(float(mean_d2))
    # and decays thereafter like any finite cell
    again, _, _ = update_density_grid(
        key, recovered, lambda x: jnp.zeros(x.shape[0]), bound=1.0,
        grid_size=16)
    assert float(again[0, 0]) <= float(recovered[0, 0])


def test_update_density_grid_nan_sigma_treated_as_empty(key):
    nan_fn = lambda x: jnp.full((x.shape[0],), jnp.nan)
    new, mean_d, occ = update_density_grid(
        key, jnp.zeros((1, 16 ** 3)), nan_fn, bound=1.0, grid_size=16)
    assert np.isfinite(np.asarray(new)).all()
    assert float(mean_d) == 0.0
