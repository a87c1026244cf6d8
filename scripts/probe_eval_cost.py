"""Probe: 800² eval-view cost on the TPU vs max_ray_batch chunk size.

The reference renders validation frames at --H/--W (800² default) through
max_ray_batch=4096 chunks (a V100 HBM number, renderer.py:1167-1186).  On
TPU the per-chunk dispatch dominates at 4096 rays; this probe measures the
wall per 800² view for several chunk sizes to pick the long-run setting.

Run: python scripts/probe_eval_cost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dreamfusion_tpu.config import Config, finalize
from dreamfusion_tpu.training.trainer import Trainer

# sacrificial tiny program (gotcha 9: first executable can hit ~100 s mode)
jnp.add(jnp.ones(8), 1.0).block_until_ready()

cfgs = {}
for chunk in (4096, 16384, 65536, 160000):
    cfg = finalize(Config(
        text="probe", workspace="/tmp/dftpu_evalprobe",
        backbone="triplane", w=64, h=64, H=800, W=800,
        fp16=True, seed=0, max_ray_batch=chunk,
        use_tensorboard=False,
    ))
    tr = Trainer(cfg, guidances={}, guidance_params={}, embeddings={})
    state = tr.init_state(jax.random.PRNGKey(0))
    from dreamfusion_tpu.training.data import circle_view_batch
    batch = circle_view_batch(cfg, 0, 4, cfg.H, cfg.W)
    ro = batch.rays_o.reshape(-1, 3)
    rd = batch.rays_d.reshape(-1, 3)
    eval_fn = tr._get_eval_fn(cfg.H, cfg.W)
    t = time.time()
    img, _, _ = eval_fn(state.ema_params, state.occ_grid, ro, rd,
                        jax.random.PRNGKey(1))
    float(jnp.sum(img))
    compile_s = time.time() - t
    times = []
    for rep in range(3):
        t = time.time()
        img, _, _ = eval_fn(state.ema_params, state.occ_grid,
                            ro + rep * 1e-6, rd, jax.random.PRNGKey(rep))
        float(jnp.sum(img))
        times.append(time.time() - t)
    print(f"chunk={chunk:>7}: compile+first={compile_s:6.1f}s  "
          f"per-view={min(times):6.3f}s  (all {['%.3f' % x for x in times]})",
          flush=True)
