"""Staged eval rendering: chunked output must equal single-shot output."""

import jax
import numpy as np


def test_chunked_eval_matches_single_shot(tmp_path):
    from dreamfusion_tpu.config import Config, finalize, replace
    from dreamfusion_tpu.training.data import circle_view_batch
    from dreamfusion_tpu.training.trainer import Trainer

    base = dict(
        text="x", workspace=str(tmp_path / "ws"), backbone="vanilla",
        w=16, h=16, num_steps=12, upsample_steps=0, hidden_dim=16,
        num_layers=2, hidden_dim_bg=8, num_layers_bg=2, fp16=False,
        seed=0, lambda_3d_normal_smooth=0.0)
    cfg_full = finalize(Config(**base, max_ray_batch=4096))
    cfg_chunk = finalize(Config(**base, max_ray_batch=48))  # non-divisor of 256

    tr1 = Trainer(cfg_full)
    state = tr1.init_state(jax.random.PRNGKey(0))
    tr2 = Trainer(cfg_chunk)

    batch = circle_view_batch(cfg_full, 0, 4, 16, 16)
    ro = batch.rays_o.reshape(-1, 3)
    rd = batch.rays_d.reshape(-1, 3)
    key = jax.random.PRNGKey(42)

    f1 = tr1._make_eval_fn(16, 16)
    f2 = tr2._make_eval_fn(16, 16)
    img1, d1, w1 = f1(state.params, state.occ_grid, ro, rd, key)
    img2, d2, w2 = f2(state.params, state.occ_grid, ro, rd, key)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=1e-5, atol=1e-5)
