"""DPT depth/normal network tests (models/dpt.py vs torch oracles).

The full omnidata model can't run here (weights need a download), so the
numerically delicate pieces are oracle-tested against torch directly:
weight-standardized convs (timm StdConv2d), TF-SAME max-pooling, the
align_corners=True bilinear upsample used by every fusion block, and the
pos-embed grid interpolation.  End-to-end wiring is covered by a tiny
random-weight forward plus the converter fixture tests
(test_convert_fixtures.py::test_dpt_*).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dreamfusion_tpu.models.dpt import (DPTConfig, DPTDepthModel, StdConv,
                                        _max_pool_same)
from dreamfusion_tpu.ops.resize import resize_bilinear

torch = pytest.importorskip("torch")


def test_stdconv_matches_torch_weight_standardization():
    """StdConv ≡ F.conv2d with per-out-channel standardized weights
    (timm StdConv2d, eps 1e-6) incl. the TF-SAME stride-2 padding."""
    import torch.nn.functional as TF
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 9, 5), dtype=np.float32)
    w = rng.standard_normal((3, 3, 5, 7), dtype=np.float32)

    m = StdConv(features=7, kernel_size=3, strides=2)
    out = m.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))

    tw = torch.tensor(w.transpose(3, 2, 0, 1))          # [O,I,kh,kw]
    tw = (tw - tw.mean(dim=[1, 2, 3], keepdim=True)) / \
        torch.sqrt(tw.var(dim=[1, 2, 3], unbiased=False, keepdim=True)
                   + 1e-6)
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    # TF-SAME for n=9, k=3, s=2: total pad 0? out=ceil(9/2)=5 →
    # (5-1)*2+3-9 = 2 → (1, 1)
    tx = TF.pad(tx, (1, 1, 1, 1))
    ref = TF.conv2d(tx, tw, stride=2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_max_pool_same_matches_torch():
    import torch.nn.functional as TF
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 10, 10, 4), dtype=np.float32)
    out = _max_pool_same(jnp.asarray(x), 3, 2)
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    # TF-SAME n=10 k=3 s=2: out 5, total (5-1)*2+3-10 = 1 → (0, 1)
    tx = TF.pad(tx, (0, 1, 0, 1), value=float("-inf"))
    ref = TF.max_pool2d(tx, 3, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref)


def test_resize_align_corners_matches_torch():
    """Fusion-block ×2 upsample ≡ F.interpolate(align_corners=True)."""
    import torch.nn.functional as TF
    rng = np.random.default_rng(2)
    for hw, out_hw in (((5, 7), (10, 14)), ((4, 4), (8, 8)),
                       ((6, 6), (9, 9))):
        x = rng.standard_normal((2, *hw, 3), dtype=np.float32)
        y = resize_bilinear(jnp.asarray(x), out_hw, align_corners=True)
        ref = TF.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)),
                             size=out_hw, mode="bilinear",
                             align_corners=True)
        np.testing.assert_allclose(
            np.asarray(y), ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_pos_embed_resize_matches_torch():
    """Non-384 inputs interpolate the pos-embed grid exactly like the
    reference's _resize_pos_embed (dpt.py:118-133, align_corners=False)."""
    import torch.nn.functional as TF
    rng = np.random.default_rng(3)
    grid = rng.standard_normal((1, 24, 24, 8), dtype=np.float32)
    y = resize_bilinear(jnp.asarray(grid), (12, 16), antialias=False)
    ref = TF.interpolate(torch.tensor(grid.transpose(0, 3, 1, 2)),
                         size=(12, 16), mode="bilinear",
                         align_corners=False)
    np.testing.assert_allclose(
        np.asarray(y), ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_dpt_tiny_forward_shapes_and_finiteness():
    cfg = DPTConfig(num_channels=3, vit_depth=2, resnet_depths=(1, 1, 1),
                    hooks=(0, 1), non_negative=False)
    m = DPTDepthModel(cfg)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = m.apply(p, jnp.linspace(0, 1, 2 * 64 * 64 * 3,
                                  dtype=jnp.float32).reshape(2, 64, 64, 3))
    assert out.shape == (2, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())


def test_dpt_full_param_count():
    """vitb_rn50_384 + project readout + DPT head ≈ 123M params (the
    published omnidata model size) — catches topology regressions."""
    m = DPTDepthModel(DPTConfig.depth())
    t = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, 384, 384, 3))),
                       jax.random.PRNGKey(0))["params"]
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(t))
    assert 115e6 < n < 132e6, n / 1e6
