"""Unit tests for the core camera/ray/sampling math against independent
numpy oracles (mirroring reference semantics, SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.core.math import linear_to_srgb, safe_normalize, srgb_to_linear
from dreamfusion_tpu.core.poses import circle_poses, get_view_direction, rand_poses
from dreamfusion_tpu.core.rays import get_rays, intrinsics_from_fov, mvp_from_pose, projection_matrix
from dreamfusion_tpu.core.sampling import near_far_from_bound, sample_pdf, stratified_zs


def test_safe_normalize():
    x = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
    n = safe_normalize(x)
    np.testing.assert_allclose(n[0], [0.6, 0.8, 0.0], atol=1e-6)
    assert np.all(np.isfinite(np.asarray(n[1])))


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x, atol=2e-3)


def test_circle_pose_lookat_origin():
    poses, dirs = circle_poses(jnp.array([3.2]), jnp.array([90.0]), jnp.array([0.0]))
    p = np.asarray(poses[0])
    # camera at radius 3.2 on +z axis (phi=0 → +z), looking at origin
    np.testing.assert_allclose(p[:3, 3], [0, 0, 3.2], atol=1e-5)
    # forward column (z axis of camera) points away from origin
    np.testing.assert_allclose(p[:3, 2], [0, 0, 1], atol=1e-5)
    # rotation is orthonormal
    R = p[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert int(dirs[0]) == 0  # front


def test_view_direction_bins():
    import math
    th = jnp.deg2rad(jnp.array([90.0, 90.0, 90.0, 90.0, 5.0, 175.0]))
    ph = jnp.deg2rad(jnp.array([0.0, 90.0, 180.0, 270.0, 0.0, 0.0]))
    d = get_view_direction(th, ph, math.radians(30), math.radians(60))
    assert list(np.asarray(d)) == [0, 1, 2, 3, 4, 5]


def test_rand_poses_on_sphere(key):
    pb = rand_poses(key, 32, radius_range=(3.0, 3.5), theta_range=(45, 105))
    c = np.asarray(pb.poses[:, :3, 3])
    r = np.linalg.norm(c, axis=-1)
    assert np.all(r >= 3.0 - 1e-5) and np.all(r <= 3.5 + 1e-5)
    th = np.asarray(pb.thetas)
    assert np.all(th >= 45 - 1e-4) and np.all(th <= 105 + 1e-4)
    # rotations orthonormal
    R = np.asarray(pb.poses[:, :3, :3])
    np.testing.assert_allclose(R @ np.swapaxes(R, 1, 2),
                               np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)


def test_get_rays_center_pixel():
    # camera at +z looking at origin: center ray should go towards -z (world)
    poses, _ = circle_poses(jnp.array([3.2]), jnp.array([90.0]), jnp.array([0.0]))
    H = W = 8
    intr = intrinsics_from_fov(jnp.asarray(60.0), H, W)
    ro, rd = get_rays(poses, intr, H, W)
    assert ro.shape == (1, 64, 3) and rd.shape == (1, 64, 3)
    d_mean = np.array(jnp.mean(rd[0], axis=0))
    d_mean /= np.linalg.norm(d_mean)
    np.testing.assert_allclose(d_mean, [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ro[0, 0]), [0, 0, 3.2], atol=1e-5)


def test_get_rays_oracle():
    """Pixel-level oracle for the reference's direction formula
    (nerf/utils.py:160-166)."""
    rng = np.random.default_rng(1)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    pose[:3, 3] = rng.normal(size=3)
    H, W = 4, 6
    fx, fy, cx, cy = 10.0, 11.0, W / 2, H / 2
    ro, rd = get_rays(jnp.asarray(pose)[None],
                      jnp.array([fx, fy, cx, cy]), H, W)
    for h in range(H):
        for w in range(W):
            i, j = w + 0.5, h + 0.5
            cam = np.array([(i - cx) / fx, -(j - cy) / fy, -1.0])
            world = pose[:3, :3] @ cam
            np.testing.assert_allclose(np.asarray(rd[0, h * W + w]), world,
                                       atol=1e-5)


def test_near_far_cube():
    ro = jnp.array([[0.0, 0.0, 3.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])
    near, far = near_far_from_bound(ro, rd, 1.0, kind="cube", min_near=0.05)
    np.testing.assert_allclose(near[0, 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(far[0, 0], 4.0, atol=1e-5)
    # miss
    rd2 = jnp.array([[1.0, 0.0, 0.0]])
    near2, far2 = near_far_from_bound(ro, rd2, 1.0, kind="cube")
    assert float(near2[0, 0]) == pytest.approx(1e9)


def test_sample_pdf_concentrates(key):
    bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(2, axis=0)  # [2, 11]
    w = jnp.zeros((2, 10)).at[:, 5].set(1.0)                    # mass in [0.5,0.6]
    s = sample_pdf(key, bins, w, 100, det=True)
    s = np.asarray(s)
    assert (np.abs(s - 0.55) < 0.06).mean() > 0.95


def test_stratified_zs_bounds(key):
    near = jnp.full((4, 1), 2.0)
    far = jnp.full((4, 1), 4.0)
    z = stratified_zs(key, near, far, 16, perturb=True)
    assert z.shape == (4, 16)
    z = np.asarray(z)
    assert z.min() > 1.8 and z.max() < 4.2
    assert np.all(np.diff(np.sort(z, axis=-1), axis=-1) >= 0)


def test_projection_mvp():
    poses, _ = circle_poses(jnp.array([3.2]), jnp.array([90.0]), jnp.array([0.0]))
    proj = projection_matrix(jnp.asarray(100.0), 64, 64, 0.01, 1000.0)
    mvp = mvp_from_pose(poses, proj)
    # origin should project to image center with positive depth
    clip = np.asarray(mvp[0]) @ np.array([0, 0, 0, 1.0])
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-5)
    # against a general 4x4 inverse
    ref = np.asarray(proj) @ np.linalg.inv(np.asarray(poses[0]))
    np.testing.assert_allclose(np.asarray(mvp[0]), ref, atol=1e-4)


def test_sample_pdf_stratified_is_sorted(key):
    """Perturbed draws are stratified → inverse-CDF output is monotone
    (the occupancy march relies on this instead of sorting)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dreamfusion_tpu.core.sampling import sample_pdf

    B, T = 16, 33
    bins = jnp.cumsum(jax.random.uniform(key, (B, T)) + 0.01, axis=-1)
    w = jax.random.uniform(jax.random.PRNGKey(5), (B, T - 1))
    z = sample_pdf(jax.random.PRNGKey(6), bins, w, 64, det=False)
    dz = np.diff(np.asarray(z), axis=-1)
    assert (dz >= -1e-6).all()
    # samples live within the bin range
    assert (np.asarray(z) >= np.asarray(bins[:, :1]) - 1e-5).all()
    assert (np.asarray(z) <= np.asarray(bins[:, -1:]) + 1e-5).all()


def test_fast_random_params_grouped_slabs(monkeypatch):
    """Device-branch init with multiple slab groups (the transient cap
    that keeps a 4.2B-param tower from doubling HBM — utils/params):
    grouped generation must cover every leaf, honor dtype, and keep the
    ~N(0, scale) statistics; the barrier chain is a scheduling hint only."""
    import flax.linen as nn

    import dreamfusion_tpu.utils.params as P

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(5):
                x = nn.Dense(96)(x)
            return x

    m = M()
    init = lambda: m.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 48)))["params"]
    monkeypatch.setattr(P, "_SLAB_GROUP_ELEMS", 5000)  # force many groups
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        p = P.fast_random_params(init, seed=11, dtype=jnp.bfloat16)
    finally:
        monkeypatch.undo()
    leaves = jax.tree_util.tree_leaves(p)
    assert all(l.dtype == jnp.bfloat16 for l in leaves)
    shapes_ref = jax.tree_util.tree_leaves(jax.eval_shape(init))
    assert [tuple(l.shape) for l in leaves] == \
        [tuple(s.shape) for s in shapes_ref]
    big = [l for l in leaves if l.size > 1000]
    for l in big:
        sd = float(jnp.std(l.astype(jnp.float32)))
        assert 0.015 < sd < 0.025, sd
