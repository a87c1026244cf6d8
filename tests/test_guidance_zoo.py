"""zero123 / IF / CLIP guidance tests + image-conditioned training smoke."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.guidance.clip import CLIPConfig, CLIPGuidance
from dreamfusion_tpu.guidance.deepfloyd import IFConfig, IFGuidance
from dreamfusion_tpu.guidance.zero123 import (
    Zero123Config, Zero123Guidance, spherical_angle_between,
)


def test_spherical_angle_between():
    import math
    # same point → 0; opposite azimuths on equator → 180 deg
    v1 = jnp.array([[1.0, math.pi / 2, 0.0]])
    v2 = jnp.array([[1.0, math.pi / 2, 0.0], [1.0, math.pi / 2, math.pi]])
    a = np.rad2deg(np.asarray(spherical_angle_between(v1, v2)))
    np.testing.assert_allclose(a[0], [0.0, 180.0], atol=1e-3)


@pytest.fixture(scope="module")
def z123():
    g = Zero123Guidance(Zero123Config(tiny=True))
    params = g.init_params(jax.random.PRNGKey(0))
    return g, params


def test_zero123_cc_projection_identity_init(z123):
    g, params = z123
    ctx = g.unet.cfg.context_dim
    emb = jnp.ones((1, 1, ctx))
    T = jnp.zeros((1, 1, 4))
    x = jnp.concatenate([emb, T], axis=-1)
    out = jnp.einsum("bld,dc->blc", x, params["cc_projection"]["kernel"]) + \
        params["cc_projection"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(emb), atol=1e-6)


def test_zero123_sds_and_grad(z123, key, rng):
    g, params = z123
    img = rng.uniform(0, 1, (1, 24, 24, 3)).astype(np.float32)
    emb = g.prepare_image_embeddings(params, img[0])
    pred = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    polar = jnp.array([10.0])
    azim = jnp.array([30.0])
    radius = jnp.array([0.1])

    def loss(p):
        return g.sds_loss(params, key, emb, p, polar, azim, radius,
                          guidance_scale=5.0)

    val, grad = jax.value_and_grad(loss)(pred)
    assert np.isfinite(float(val))
    assert float(jnp.abs(grad).sum()) > 0


def test_zero123_multi_ref(z123, key, rng):
    g, params = z123
    imgs = rng.uniform(0, 1, (2, 24, 24, 3)).astype(np.float32)
    emb = g.prepare_image_embeddings(
        params, imgs, ref_polars=(90.0, 90.0), ref_azimuths=(0.0, 90.0),
        ref_radii=(3.2, 3.2), zero123_ws=(1.0, 1.0))
    pred = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    val = g.sds_loss(params, key, emb, pred, jnp.array([5.0]),
                     jnp.array([45.0]), jnp.array([0.0]))
    assert np.isfinite(float(val))


def test_zero123_novel_view(z123, key):
    g, params = z123
    img = np.full((24, 24, 3), 0.5, np.float32)
    emb = g.prepare_image_embeddings(params, img)
    out = g.novel_view(params, key, emb, jnp.array([0.0]), jnp.array([45.0]),
                       jnp.array([0.0]), num_inference_steps=2)
    assert out.shape[0] == 1 and out.shape[-1] == 3
    assert np.isfinite(np.asarray(out)).all()


# ---------------- IF ----------------

@pytest.fixture(scope="module")
def if_g():
    g = IFGuidance(IFConfig(tiny=True))
    params = g.init_params(jax.random.PRNGKey(0))
    return g, params


def test_if_sds(if_g, key, rng):
    g, params = if_g
    emb = g.prepare_embeddings(params, "a hamburger")
    pred = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))

    def loss(p):
        return g.sds_loss(params, key, emb["default"], emb["uncond"], p)

    val, grad = jax.value_and_grad(loss)(pred)
    assert np.isfinite(float(val)) and float(jnp.abs(grad).sum()) > 0


def test_if_perpneg_and_sampler(if_g, key, rng):
    g, params = if_g
    from dreamfusion_tpu.guidance.perpneg import adjust_text_embeddings
    emb = g.prepare_embeddings(params, "a hamburger")
    pn = adjust_text_embeddings(emb, jnp.array([100.0]))
    pred = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    val = g.sds_loss_perpneg(params, key, pn.text_z, pn.weights,
                             emb["uncond"], pred)
    assert np.isfinite(float(val))
    img = g.produce_imgs(params, key, emb["default"], emb["uncond"],
                         num_inference_steps=2)
    assert np.isfinite(np.asarray(img)).all()


def test_if_guidance_eval(if_g, key, rng):
    """--save_guidance debug pair for IF (reference nerf/utils.py:1028-1048
    covers all priors)."""
    g, params = if_g
    emb = g.prepare_embeddings(params, "a hamburger")
    pred = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    noisy, denoised = g.guidance_eval(params, key, emb["default"],
                                      emb["uncond"], pred)
    for a in (noisy, denoised):
        assert a.shape == (1, g._size, g._size, 3)
        a = np.asarray(a)
        assert np.isfinite(a).all() and a.min() >= 0 and a.max() <= 1


def test_zero123_guidance_eval(z123, key, rng):
    g, params = z123
    img = rng.uniform(0, 1, (1, 24, 24, 3)).astype(np.float32)
    emb = g.prepare_image_embeddings(params, img[0])
    pred = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    zeros = jnp.zeros((1,))
    noisy, denoised = g.guidance_eval(params, key, emb, pred,
                                      zeros, zeros, zeros)
    for a in (noisy, denoised):
        assert a.shape[0] == 1 and a.shape[-1] == 3
        assert np.isfinite(np.asarray(a)).all()


# ---------------- CLIP ----------------

def test_clip_guidance_loss_and_grad(key, rng):
    g = CLIPGuidance(CLIPConfig(tiny=True))
    params = g.init_params(jax.random.PRNGKey(0))
    ref_img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    clip_z = g.prepare_embeddings(params, text="a hamburger", image=ref_img)
    assert "text" in clip_z and "image" in clip_z
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(clip_z["text"])), 1.0, rtol=1e-4)

    pred = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    val, grad = jax.value_and_grad(
        lambda p: g.loss(params, clip_z, p))(pred)
    assert np.isfinite(float(val))
    assert float(jnp.abs(grad).sum()) > 0
    # same image → loss decreases vs random image
    same = g.loss(params, {"image": clip_z["image"]},
                  jnp.asarray(ref_img)[None], grad_scale=1.0)
    other = g.loss(params, {"image": clip_z["image"]},
                   jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(
                       np.float32)), grad_scale=1.0)
    assert float(same) < float(other)


# ---------------- image-conditioned training smoke ----------------

def test_image_conditioned_training(tmp_path, rng):
    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.training.image_data import RefImages
    from dreamfusion_tpu.training.trainer import Trainer

    K, H, W = 1, 16, 16
    cfg = finalize(Config(
        image="fake.png", workspace=str(tmp_path / "ws"), backbone="vanilla",
        w=W, h=H, iters=4, dataset_size_train=2, latent_iter_ratio=0.0,
        known_view_interval=2, known_view_scale=1.0, fp16=False,
        num_steps=8, upsample_steps=4, hidden_dim=16, num_layers=2,
        hidden_dim_bg=8, num_layers_bg=2, eval_interval=-1, seed=0,
        guidance=("zero123",), guidance_scale=5.0,
        lambda_3d_normal_smooth=0.0, lambda_normal=1.0, lambda_depth=10.0,
    ))
    Hs = int(cfg.known_view_scale * H)
    ref = RefImages(
        rgb=rng.uniform(0, 1, (K, Hs, Hs, 3)).astype(np.float32),
        mask=np.ones((K, Hs, Hs), bool),
        depth=rng.uniform(1, 2, (K, Hs, Hs)).astype(np.float32),
        normal=rng.uniform(0, 1, (K, Hs, Hs, 3)).astype(np.float32),
    )
    g = Zero123Guidance(Zero123Config(tiny=True))
    gp = g.init_params(jax.random.PRNGKey(0))
    emb = g.prepare_image_embeddings(gp, ref.rgb, ref.polars, ref.azimuths,
                                     ref.radii, ref.weights)
    tr = Trainer(cfg, guidances={"zero123": g}, guidance_params={"zero123": gp},
                 embeddings={"zero123": emb}, ref_images=ref)
    state = tr.init_state(jax.random.PRNGKey(0))
    state = tr.train(state, max_steps=cfg.iters)
    assert int(state.step) == cfg.iters
    assert np.isfinite(tr.stats["loss"][-1])


def test_known_view_step_applies_volume_regularizers(tmp_path, rng):
    """The reference applies opacity/entropy/orient/normal-smooth in EVERY
    non-dmtet step, known-view RGBD steps included (nerf/utils.py:685-713
    runs unconditionally after the branch) — VERDICT r3 #5."""
    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.training.image_data import RefImages
    from dreamfusion_tpu.training.trainer import Trainer

    K, H, W = 1, 16, 16

    def make_cfg(lambda_entropy, ws):
        return finalize(Config(
            image="fake.png", workspace=str(tmp_path / ws),
            backbone="vanilla", w=W, h=H, iters=4, dataset_size_train=2,
            latent_iter_ratio=0.0, known_view_interval=1,
            known_view_scale=1.0, fp16=False, num_steps=8, upsample_steps=4,
            hidden_dim=16, num_layers=2, hidden_dim_bg=8, num_layers_bg=2,
            eval_interval=-1, seed=0, guidance=("zero123",),
            lambda_entropy=lambda_entropy, lambda_opacity=0.0,
            lambda_orient=0.0, lambda_3d_normal_smooth=0.0,
            lambda_normal=0.0, lambda_depth=0.0, use_tensorboard=False,
        ))

    ref = RefImages(
        rgb=rng.uniform(0, 1, (K, H, W, 3)).astype(np.float32),
        mask=np.ones((K, H, W), bool), depth=None, normal=None)

    losses = {}
    for lam, ws in ((0.0, "ws0"), (1000.0, "ws1")):
        cfg = make_cfg(lam, ws)
        tr = Trainer(cfg, guidances={}, guidance_params={}, embeddings={},
                     ref_images=ref)
        state = tr.init_state(jax.random.PRNGKey(0))
        # nonzero step: the entropy weight ramps as min(1, 2*step/iters)
        # (reference utils.py:695) and is exactly 0 at step 0
        state = state.replace(step=jnp.asarray(2, jnp.int32))
        step = tr._make_known_view_step()
        _, metrics = step(state, jax.random.PRNGKey(1))
        losses[lam] = float(metrics["loss"])
    # entropy of an untrained semi-transparent field is strictly positive,
    # so a huge lambda_entropy must move the known-view loss
    assert losses[1000.0] > losses[0.0] + 1e-4, losses
