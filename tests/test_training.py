"""Training-layer tests: Adan vs numpy oracle, end-to-end tiny train loop."""

import os
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.config import Config, finalize
from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
from dreamfusion_tpu.training.optimizer import adan, build_optimizer
from dreamfusion_tpu.training.trainer import Trainer


# ---------------- Adan oracle ----------------

def test_adan_matches_reference_formula():
    """Hand-rolled numpy simulation of the Adan update
    (reference optimizer.py:202-256)."""
    b1, b2, b3, eps, wd, lr = 0.98, 0.92, 0.99, 1e-8, 2e-5, 0.01
    opt = adan(lr, b1, b2, b3, eps, wd, max_grad_norm=0.0)
    p = jnp.array([1.0, -2.0])
    state = opt.init(p)
    rng = np.random.default_rng(3)
    grads = [rng.normal(size=2).astype(np.float32) for _ in range(4)]

    # numpy sim
    m = np.zeros(2); diff = np.zeros(2); n = np.zeros(2)
    pn = np.array([1.0, -2.0]); prev = None
    for k, g in enumerate(grads, start=1):
        gd = g - (prev if prev is not None else g)
        m = b1 * m + (1 - b1) * g
        diff = b2 * diff + (1 - b2) * gd
        u = g + b2 * gd
        n = b3 * n + (1 - b3) * u * u
        bc1, bc2, bc3s = 1 - b1 ** k, 1 - b2 ** k, np.sqrt(1 - b3 ** k)
        denom = np.sqrt(n) / bc3s + eps
        pn = (pn - (lr / bc1) * m / denom - (lr * b2 / bc2) * diff / denom) \
            / (1 + lr * wd)
        prev = g

    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, p)
        p = p + updates
    np.testing.assert_allclose(np.asarray(p), pn, rtol=1e-5, atol=1e-7)


def test_adan_grad_clip():
    opt = adan(0.1, max_grad_norm=1.0)
    p = jnp.zeros(3)
    state = opt.init(p)
    big = jnp.array([100.0, 0.0, 0.0])
    up1, state = opt.update(big, state, p)
    # effect of clipped grad == effect of grad with norm ~1
    opt2 = adan(0.1, max_grad_norm=0.0)
    st2 = opt2.init(p)
    up2, _ = opt2.update(jnp.array([1.0, 0.0, 0.0]), st2, p)
    np.testing.assert_allclose(np.asarray(up1), np.asarray(up2), atol=1e-4)


def test_build_optimizer_encoder_multiplier(key):
    from dreamfusion_tpu.training.optimizer import encoder_label_fn
    params = {"field": {"grid_table": jnp.ones((4, 2)),
                        "sigma_net": {"dense_0": {"kernel": jnp.ones((2, 2))}}}}
    labels = encoder_label_fn(params)
    assert labels["field"]["grid_table"] == "encoder"
    assert labels["field"]["sigma_net"]["dense_0"]["kernel"] == "net"


# ---------------- end-to-end tiny training ----------------

def tiny_config(tmp_path, backbone="vanilla", **kw):
    base = dict(
        text="a hamburger", workspace=str(tmp_path / "ws"),
        backbone=backbone, w=16, h=16, H=24, W=24,  # tiny eval res for CPU
        iters=6, dataset_size_train=3,
        latent_iter_ratio=0.34,      # first 2 steps in latent phase
        grid_levels=4, grid_log2_hashmap_size=8, grid_desired_resolution=64,
        grid_size=32, grid_coarse_steps=16, grid_fine_steps=16,
        num_steps=12, upsample_steps=4, hidden_dim=16, num_layers=2,
        hidden_dim_bg=8, num_layers_bg=2, update_extra_interval=4,
        fp16=False, eval_interval=-1, max_keep_ckpt=2, seed=0,
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


@pytest.mark.parametrize("backbone", ["vanilla", "grid"])
def test_train_loop_smoke(tmp_path, tiny_guidance, backbone):
    g, gparams, emb = tiny_guidance
    cfg = tiny_config(tmp_path, backbone=backbone)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    state = tr.init_state(jax.random.PRNGKey(0))
    p0 = jax.tree.map(lambda x: x.copy(), state.params)
    state = tr.train(state, max_steps=cfg.iters)
    assert int(state.step) == cfg.iters
    # params moved and stayed finite
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    moved = sum(float(jnp.abs(a - b).sum()) for a, b in
                zip(leaves, jax.tree_util.tree_leaves(p0)))
    assert moved > 0
    # loss recorded
    assert len(tr.stats["loss"]) >= 1
    assert np.isfinite(tr.stats["loss"][-1])
    if backbone == "grid":
        assert float(state.mean_density) >= 0

    # checkpoint roundtrip
    tr.save_checkpoint(state)
    tr2 = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                  embeddings={"SD": emb})
    template = tr2.init_state(jax.random.PRNGKey(1))
    restored, ok = tr2.load_checkpoint(template, "latest")
    assert ok
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
    assert tr2.global_step == tr.global_step


def test_eval_and_test_write_outputs(tmp_path, tiny_guidance):
    g, gparams, emb = tiny_guidance
    cfg = tiny_config(tmp_path, backbone="vanilla", iters=2,
                      latent_iter_ratio=0.0)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    state = tr.init_state(jax.random.PRNGKey(0))
    tr.evaluate(state, n_views=2)
    files = os.listdir(os.path.join(tr.workspace, "validation"))
    assert len([f for f in files if f.endswith("_rgb.png")]) == 2
    assert len([f for f in files if f.endswith("_depth.png")]) == 2
    # eval renders at the eval resolution (cfg.H/cfg.W), not training res
    from PIL import Image
    rgb = [f for f in sorted(files) if f.endswith("_rgb.png")][0]
    assert Image.open(os.path.join(tr.workspace, "validation",
                                   rgb)).size == (tr.cfg.W, tr.cfg.H)
    tr.test(state, n_frames=3, write_video=True)
    results = os.listdir(os.path.join(tr.workspace, "results"))
    assert len(results) >= 1


def test_best_model_checkpoint_roundtrip(tmp_path, tiny_guidance):
    """df (EMA-only) checkpoint: save after eval, load via --ckpt best."""
    g, gparams, emb = tiny_guidance
    cfg = tiny_config(tmp_path, backbone="vanilla", iters=2,
                      latent_iter_ratio=0.0)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    state = tr.init_state(jax.random.PRNGKey(0))
    state = tr.train(state, max_steps=2)
    tr.save_checkpoint(state, full=False)

    tr2 = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                  embeddings={"SD": emb})
    template = tr2.init_state(jax.random.PRNGKey(5))
    restored, ok = tr2.load_checkpoint(template, "best")
    assert ok
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]))
    # params are set to the EMA weights (model-only load)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]))


def test_save_guidance_snapshot(tmp_path, tiny_guidance):
    """--save_guidance triptych (render|noised|denoised) gets written."""
    g, gparams, emb = tiny_guidance
    cfg = tiny_config(tmp_path, backbone="vanilla", iters=3,
                      latent_iter_ratio=0.0, save_guidance=True,
                      save_guidance_interval=1)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    state = tr.init_state(jax.random.PRNGKey(0))
    # dataset_size_train=3 → epoch 1 at step 3 (epoch 0 writes no snapshot)
    state = tr.train(state, max_steps=3)
    gdir = os.path.join(tr.workspace, "guidance")
    files = os.listdir(gdir)
    assert files, "guidance triptych not written"
    import imageio.v2 as imageio
    im = imageio.imread(os.path.join(gdir, files[0]))
    assert im.shape[1] == 3 * im.shape[0]   # 3 panels wide


def test_best_checkpoint_keeps_best_by_metric(tmp_path, tiny_guidance):
    """Reference best-mode semantics (utils.py:1236-1264): with a metric,
    the df snapshot is only overwritten on improvement; a later WORSE eval
    must not clobber the best weights, and the best metric survives a
    trainer restart via df.meta.json."""
    g, gparams, emb = tiny_guidance
    cfg = tiny_config(tmp_path, backbone="vanilla", iters=2,
                      latent_iter_ratio=0.0)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    state_a = tr.init_state(jax.random.PRNGKey(0))
    state_b = tr.init_state(jax.random.PRNGKey(1))

    tr.save_checkpoint(state_a, full=False, metric=20.0)   # best so far
    tr.save_checkpoint(state_b, full=False, metric=10.0)   # worse: ignored

    tr2 = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                  embeddings={"SD": emb})
    template = tr2.init_state(jax.random.PRNGKey(5))
    restored, ok = tr2.load_checkpoint(template, "best")
    assert ok
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state_a.ema_params)[0]))
    assert tr2.stats["best_result"] == 20.0   # restored from df.meta.json

    # an improvement DOES overwrite
    tr2.save_checkpoint(state_b, full=False, metric=25.0)
    restored2, ok = tr2.load_checkpoint(template, "best")
    assert ok
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored2.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state_b.ema_params)[0]))


def test_split_step_matches_fused(tmp_path, tiny_guidance):
    """cfg.split_step builds 3 programs whose composed update must equal
    the fused step's (same math, same rng) — both phases."""
    g, gparams, emb = tiny_guidance
    cfg_f = tiny_config(tmp_path, backbone="vanilla", workspace=str(
        tmp_path / "wsf"), lambda_opacity=1e-3)
    cfg_s = replace(cfg_f, split_step=True, workspace=str(tmp_path / "wss"))

    tr_f = Trainer(cfg_f, guidances={"SD": g},
                   guidance_params={"SD": gparams}, embeddings={"SD": emb})
    tr_s = Trainer(cfg_s, guidances={"SD": g},
                   guidance_params={"SD": gparams}, embeddings={"SD": emb})
    state_f = tr_f.init_state(jax.random.PRNGKey(0))
    state_s = tr_s.init_state(jax.random.PRNGKey(0))

    for phase in ("main", "latent"):
        step_f = tr_f._make_train_step(phase)
        step_s = tr_s._make_train_step(phase)
        key = jax.random.PRNGKey(42)
        nf, mf = step_f(state_f, key)
        ns, ms = step_s(state_s, key)
        np.testing.assert_allclose(float(mf["loss"]), float(ms["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(mf["loss_sds"]),
                                   float(ms["loss_sds"]), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(nf.params),
                        jax.tree_util.tree_leaves(ns.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)


def test_grad_clip_rgb_bounds_image_gradient(tmp_path, tiny_guidance):
    """--grad_clip_rgb clamps d(SDS)/d(rgb) elementwise
    (reference backward hook, utils.py:1052-1063)."""
    g, gparams, emb = tiny_guidance
    limit = 1e-7  # tiny limit so the clamp provably bites
    cfg = tiny_config(tmp_path, backbone="vanilla", grad_clip_rgb=limit)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    from dreamfusion_tpu.training.data import sample_train_batch
    batch = sample_train_batch(jax.random.PRNGKey(1), cfg, cfg.h, cfg.w,
                               None, None, None, None)
    img = jax.random.uniform(jax.random.PRNGKey(2),
                             (1, cfg.h, cfg.w, 3))

    def sds(img):
        return tr._guidance_loss({"SD": gparams}, jax.random.PRNGKey(3),
                                 img, batch, as_latent=False)

    cot = jax.grad(sds)(img)
    assert float(jnp.abs(cot).max()) <= limit + 1e-12
    # ... and the clamp actually bit (unclipped grad exceeds the limit)
    cfg2 = replace(cfg, grad_clip_rgb=-1.0)
    tr2 = Trainer(cfg2, guidances={"SD": g}, guidance_params={"SD": gparams},
                  embeddings={"SD": emb})

    def sds2(img):
        return tr2._guidance_loss({"SD": gparams}, jax.random.PRNGKey(3),
                                  img, batch, as_latent=False)

    assert float(jnp.abs(jax.grad(sds2)(img)).max()) > limit


def test_async_save_failure_raises_on_join(tmp_path, tiny_guidance,
                                           monkeypatch):
    """A failing async rolling save must surface at the next join — a
    silently-stale checkpoint is the failure you only discover on resume."""
    import orbax.checkpoint as ocp

    g, gparams, emb = tiny_guidance
    cfg = tiny_config(tmp_path, backbone="vanilla", iters=2,
                      latent_iter_ratio=0.0)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    state = tr.init_state(jax.random.PRNGKey(0))

    def boom(self, *a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ocp.StandardCheckpointer, "save", boom)
    tr.save_checkpoint(state, async_=True)
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        tr.join_pending_saves()
    # the error is consumed: a second join is clean
    tr.join_pending_saves()


def test_run_stats_written(tmp_path, tiny_guidance):
    """train() writes an attributable per-phase wall-clock breakdown."""
    import json as _json

    g, gparams, emb = tiny_guidance
    cfg = tiny_config(tmp_path, backbone="vanilla", iters=3,
                      dataset_size_train=3, latent_iter_ratio=0.0,
                      eval_interval=1)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    state = tr.init_state(jax.random.PRNGKey(0))
    tr.train(state, max_steps=cfg.iters)
    with open(os.path.join(tr.workspace, "run_stats.json")) as f:
        ts = _json.load(f)
    assert ts["n_steps"] == 3
    assert ts["train_wall"] > 0
    assert ts["eval"] > 0          # eval_interval=1 ran an eval
    assert ts["steady_it_s"] > 0
    assert ts["steps"] <= ts["train_wall"]


def test_clip_eval_metric_for_text_only(tmp_path, tiny_guidance):
    """With a CLIP scorer installed, evaluate() returns a float metric for
    text-only runs (prompt cosine, r_precision scoring rule) and the df
    snapshot becomes best-by-metric instead of best==latest."""
    from dreamfusion_tpu.guidance.clip import CLIPConfig, CLIPGuidance

    g, gparams, emb = tiny_guidance
    cfg = tiny_config(tmp_path, backbone="vanilla", iters=2)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    cg = CLIPGuidance(CLIPConfig(tiny=True))
    cp = cg.init_params(jax.random.PRNGKey(3))
    cz = cg.prepare_embeddings(cp, "a hamburger")
    assert "text" in cz
    tr.set_clip_scorer(cg, cp, cz)
    state = tr.init_state(jax.random.PRNGKey(0))
    m = tr.evaluate(state, n_views=1)
    assert m is not None and np.isfinite(m)
    # higher-better bookkeeping: a worse metric keeps the previous snapshot
    tr.save_checkpoint(state, full=False, metric=m)
    assert tr.stats["best_result"] == m
    tr.save_checkpoint(state, full=False, metric=m - 1.0)
    assert tr.stats["best_result"] == m


def test_scan_block_training_path(tmp_path, tiny_guidance):
    """When steps align with the log cadence, train() dispatches ONE
    scan-block program per dataset_size_train steps (grid updates ride
    inside under lax.cond).  Exercises both phases (latent+main blocks)
    with a non-dividing update interval."""
    g, gparams, emb = tiny_guidance
    cfg = tiny_config(tmp_path, backbone="grid", iters=8,
                      dataset_size_train=4, update_extra_interval=3,
                      latent_iter_ratio=0.5, scan_blocks=True)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    assert tr is not None
    state = tr.init_state(jax.random.PRNGKey(0))
    state = tr.train(state, max_steps=8)
    assert int(state.step) == 8
    assert tr.global_step == 8
    assert all(np.isfinite(l) for l in tr.stats["loss"])
    # the in-block lax.cond grid updates ran (mean_density got populated)
    assert float(state.mean_density) > 0
    # the block fast-path was actually built for this config
    assert getattr(tr._train_step_main, "block", None) is not None
    assert tr._train_step_main.block_size == 4


def test_fused_phase_program_matches_split_phases(tmp_path, tiny_guidance):
    """phase='fused' (one executable, traced warmup predicate) must equal
    the separate latent/main programs step-for-step on both sides of the
    warmup boundary.  lambda_orient=0 so the phases share render flags
    (with orient on, fused applies it during warmup too — the
    reference-faithful behavior, nerf/utils.py:687-713)."""
    g, gparams, emb = tiny_guidance
    cfg = tiny_config(tmp_path, backbone="vanilla",
                      workspace=str(tmp_path / "wsfp"), lambda_orient=0.0,
                      merge_phases=True)   # opt-in (default off: the cond
                                           # measured ~20% slower steady)
    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gparams},
                 embeddings={"SD": emb})
    assert tr._fused_phase_ok()
    state = tr.init_state(jax.random.PRNGKey(0))
    fused = tr._make_train_step("fused")
    lat = tr._make_train_step("latent")
    main = tr._make_train_step("main")
    key = jax.random.PRNGKey(42)

    def check(state, ref_step):
        nf, mf = fused(state, key)
        nr, mr = ref_step(state, key)
        np.testing.assert_allclose(float(mf["loss"]), float(mr["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(nf.params),
                        jax.tree_util.tree_leaves(nr.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)

    # step 0: r=0 <= latent_iter_ratio → warmup branch
    check(state, lat)
    # past the boundary (iters=6, ratio 0.34 → step 5: r≈0.83) → main
    late = state.replace(step=jnp.asarray(5, jnp.int32))
    check(late, main)
