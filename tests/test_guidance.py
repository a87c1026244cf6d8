"""Guidance stack tests: schedules, perpneg, SDS loss on tiny models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.guidance.perpneg import (
    adjust_text_embeddings, get_perpendicular_component,
    interpolate_view_embedding, weighted_perpendicular_aggregator,
)
from dreamfusion_tpu.guidance.schedule import NoiseSchedule, make_schedule
from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance


def tiny_sd():
    return StableDiffusionGuidance(
        SDConfig(tiny=True, image_size=16, latent_size=8))


# ---------------- schedule ----------------

def test_scaled_linear_schedule_matches_diffusers_formula():
    s = NoiseSchedule.scaled_linear(T=1000)
    # betas linear in sqrt space
    np.testing.assert_allclose(s.betas[0], 0.00085, rtol=1e-5)
    np.testing.assert_allclose(s.betas[-1], 0.012, rtol=1e-5)
    assert s.alphas_cumprod[-1] < 0.01 and s.alphas_cumprod[0] > 0.99


def test_add_noise_statistics(key):
    s = make_schedule("sd")
    x0 = jnp.ones((4, 8, 8, 4))
    noise = jax.random.normal(key, x0.shape)
    t = jnp.array([10, 100, 500, 990])
    xt = s.add_noise(x0, noise, t)
    ac = s.alphas_cumprod[np.asarray(t)]
    expect = np.sqrt(ac)[:, None, None, None] * np.asarray(x0) + \
        np.sqrt(1 - ac)[:, None, None, None] * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(xt), expect, atol=1e-5)


def test_ddim_roundtrip_denoises(key):
    s = make_schedule("sd")
    x0 = jax.random.normal(key, (2, 4, 4, 4))
    t = jnp.array([500, 500])
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    xt = s.add_noise(x0, noise, t)
    # with the true noise, predict_start recovers x0
    np.testing.assert_allclose(
        np.asarray(s.predict_start_from_noise(xt, t, noise)),
        np.asarray(x0), atol=1e-4)
    # ddim step with true eps moves toward x0
    x_prev = s.ddim_step(xt, noise, t, jnp.array([400, 400]))
    d_before = float(jnp.mean((xt - x0) ** 2))
    d_after = float(jnp.mean((x_prev - x0) ** 2))
    assert d_after < d_before


# ---------------- perpneg ----------------

def test_perpendicular_component():
    x = jnp.array([1.0, 1.0, 0.0])
    y = jnp.array([1.0, 0.0, 0.0])
    p = get_perpendicular_component(x, y)
    np.testing.assert_allclose(np.asarray(p), [0, 1, 0], atol=1e-6)


def test_weighted_perpendicular_aggregator(rng):
    B, K = 2, 3
    d = rng.normal(size=(B * K, 4, 4, 2)).astype(np.float32)
    w = np.concatenate([np.ones(B), rng.normal(size=B * (K - 1))]).astype(np.float32)
    out = weighted_perpendicular_aggregator(jnp.asarray(d), jnp.asarray(w), B)
    # oracle
    dd = d.reshape(K, B, 4, 4, 2)
    expect = dd[0].copy()
    for i in range(1, K):
        for b in range(B):
            if abs(w[i * B + b]) > 1e-4:
                x, y = dd[i, b].ravel(), dd[0, b].ravel()
                perp = x - (x @ y) / max(y @ y, 1e-6) * y
                expect[b] += w[i * B + b] * perp.reshape(4, 4, 2)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_adjust_text_embeddings_structure(rng):
    emb = {k: jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))
           for k in ["front", "side", "back"]}
    az = jnp.array([0.0, 45.0, 135.0, -170.0])
    pn = adjust_text_embeddings(emb, az)
    assert pn.text_z.shape == (12, 4, 8)
    assert pn.weights.shape == (12,)
    np.testing.assert_allclose(np.asarray(pn.weights[:4]), 1.0)
    # az=0 → pure front embedding, front_neg_w = 0 (r=1 > 0.8)
    np.testing.assert_allclose(np.asarray(pn.text_z[0]),
                               np.asarray(emb["front"][0]), atol=1e-6)
    assert float(pn.weights[4]) == 0.0
    # interpolate_view_embedding agrees with positive row
    pos = interpolate_view_embedding(emb, az)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(pn.text_z[:4]),
                               atol=1e-6)


# ---------------- tiny SD SDS ----------------

@pytest.fixture(scope="module")
def sd_setup():
    g = tiny_sd()
    params = g.init_params(jax.random.PRNGKey(0))
    return g, params


def test_sds_loss_grad_flows_to_image(sd_setup, key):
    g, params = sd_setup
    tl = g.text_encoder.cfg.max_len
    ctx = g.unet.cfg.context_dim
    cond = jnp.ones((1, tl, ctx)) * 0.1
    uncond = jnp.zeros((1, tl, ctx))
    rgb = jnp.full((1, 16, 16, 3), 0.5)

    def loss(img):
        return g.sds_loss(params, key, cond, uncond, img, guidance_scale=7.5)

    val, grad = jax.value_and_grad(loss)(rgb)
    assert np.isfinite(float(val))
    assert float(jnp.abs(grad).sum()) > 0
    # no grad must flow into the UNet (frozen prior + stop_gradient)
    gparams = jax.grad(lambda p: g.sds_loss(p, key, cond, uncond, rgb))(params)
    unet_norm = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(gparams["unet"]))
    assert unet_norm == 0.0


def test_sds_as_latent_path(sd_setup, key):
    g, params = sd_setup
    tl, ctx = g.text_encoder.cfg.max_len, g.unet.cfg.context_dim
    cond = jnp.ones((1, tl, ctx)) * 0.1
    uncond = jnp.zeros((1, tl, ctx))
    rgba = jnp.full((1, 16, 16, 4), 0.5)
    val = g.sds_loss(params, key, cond, uncond, rgba, as_latent=True)
    assert np.isfinite(float(val))


def test_sds_perpneg_path(sd_setup, key, rng):
    g, params = sd_setup
    tl, ctx = g.text_encoder.cfg.max_len, g.unet.cfg.context_dim
    emb = {k: jnp.asarray(rng.normal(size=(1, tl, ctx)).astype(np.float32))
           for k in ["front", "side", "back"]}
    pn = adjust_text_embeddings(emb, jnp.array([30.0]))
    uncond = jnp.zeros((1, tl, ctx))
    rgb = jnp.full((1, 16, 16, 3), 0.5)
    val = g.sds_loss_perpneg(params, key, pn.text_z, pn.weights, uncond, rgb)
    assert np.isfinite(float(val))


def test_text_embeds_and_txt2img(sd_setup, key):
    g, params = sd_setup
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    emb = prepare_text_embeddings(g, params, "a hamburger")
    assert set(emb) == {"default", "uncond", "front", "side", "back"}
    assert emb["default"].shape == (1, g.text_encoder.cfg.max_len,
                                    g.text_encoder.cfg.hidden_size)
    img = g.prompt_to_img(params, key, emb["default"], emb["uncond"],
                          num_inference_steps=3)
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()
