"""mm_conv (MXU matmul conv) vs lax.conv_general_dilated oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def lax_conv(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


CASES = [
    # (kh, kw, stride, padding, H, W)
    (1, 1, 1, ((0, 0), (0, 0)), 16, 16),
    (3, 3, 1, ((1, 1), (1, 1)), 16, 16),
    (3, 3, 2, ((1, 1), (1, 1)), 16, 16),
    (3, 3, 2, ((0, 1), (0, 1)), 17, 17),   # ldm VAE asymmetric downsample
    (3, 3, 1, ((1, 1), (1, 1)), 7, 9),      # odd sizes
    (4, 4, 4, ((0, 0), (0, 0)), 16, 16),    # patchify path
    (5, 3, 1, ((2, 2), (1, 1)), 12, 10),    # rectangular kernel
]


@pytest.mark.parametrize("kh,kw,stride,pad,H,W", CASES)
def test_mm_conv_matches_lax(kh, kw, stride, pad, H, W):
    from dreamfusion_tpu.ops.conv import mm_conv
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, H, W, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((kh, kw, 6, 8)) * 0.1, jnp.float32)
    ours = mm_conv(x, w, (stride, stride), pad)
    ref = lax_conv(x, w, (stride, stride), pad)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mm_conv_same_string_padding():
    from dreamfusion_tpu.ops.conv import mm_conv
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.1, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mm_conv(x, w, (1, 1), "SAME")),
        np.asarray(lax_conv(x, w, (1, 1), "SAME")), rtol=2e-5, atol=2e-5)


def test_mmconv_module_param_layout_matches_nn_conv():
    """Drop-in contract: same param names and shapes as flax.linen.Conv."""
    import flax.linen as nn
    from dreamfusion_tpu.ops.conv import MMConv

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 5))
    ours = MMConv(7, (3, 3), strides=2, padding=1, name="c")
    theirs = nn.Conv(7, (3, 3), strides=2, padding=1, name="c")
    p_ours = ours.init(key, x)["params"]
    p_theirs = theirs.init(key, x)["params"]
    assert jax.tree_util.tree_structure(p_ours) == \
        jax.tree_util.tree_structure(p_theirs)
    for a, b in zip(jax.tree_util.tree_leaves(p_ours),
                    jax.tree_util.tree_leaves(p_theirs)):
        assert a.shape == b.shape
    # and the outputs agree when given the same params
    y_ours = ours.apply({"params": p_theirs}, x)
    y_theirs = theirs.apply({"params": p_theirs}, x)
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_theirs),
                               rtol=2e-5, atol=2e-5)


def test_mm_conv_grads_match():
    from dreamfusion_tpu.ops.conv import mm_conv
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.1, jnp.float32)
    g1 = jax.grad(lambda w: mm_conv(x, w, (1, 1), ((1, 1), (1, 1))).sum())(w)
    g2 = jax.grad(lambda w: lax_conv(x, w, (1, 1),
                                     ((1, 1), (1, 1))).sum())(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("k,s,H", [(14, 14, 28), (16, 16, 224), (3, 2, 15),
                                   (4, 4, 18)])
def test_mm_conv_same_with_stride_matches_lax(k, s, H):
    """SAME + stride > 1 (CLIP patch embedding shape) must match lax —
    stride-1 SAME splits are wrong here (caught in review)."""
    from dreamfusion_tpu.ops.conv import mm_conv
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, H, H, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, 3, 5)) * 0.1, jnp.float32)
    ours = mm_conv(x, w, (s, s), "SAME")
    ref = lax_conv(x, w, (s, s), "SAME")
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_large_spatial_dispatch_matches_reference():
    """≥256² spatial maps dispatch to XLA's conv emitter
    (ops/conv._LAX_CONV_MIN_PIXELS) — must stay numerically equivalent."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dreamfusion_tpu.ops.conv import mm_conv, _LAX_CONV_MIN_PIXELS
    key = jax.random.PRNGKey(0)
    H = W = 256
    assert H * W >= _LAX_CONV_MIN_PIXELS
    x = jax.random.normal(key, (1, H, W, 4))
    k = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 4, 6))
    out = mm_conv(x, k, (1, 1), 1)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # stride-2 (VAE downsample shape) through the same dispatch
    out2 = mm_conv(x, k, (2, 2), 1)
    ref2 = jax.lax.conv_general_dilated(
        x, k, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-5, rtol=1e-5)


def test_large_spatial_bf16_grad_and_f32_output():
    """Regression: the ≥256² lax.conv branch must (a) return f32 for bf16
    inputs like every einsum branch, and (b) be differentiable with bf16
    inputs — an earlier preferred_element_type=f32 version made the
    transpose conv mix f32 cotangents with bf16 operands and crash the
    real-size VAE-encode backward on TPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dreamfusion_tpu.ops.conv import mm_conv, _LAX_CONV_MIN_PIXELS
    key = jax.random.PRNGKey(0)
    H = W = 256
    assert H * W >= _LAX_CONV_MIN_PIXELS
    x = jax.random.normal(key, (1, H, W, 4), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 4, 6),
                          dtype=jnp.bfloat16)
    out = mm_conv(x, k, (1, 1), 1)
    assert out.dtype == jnp.float32

    g = jax.grad(lambda x_, k_: jnp.sum(mm_conv(x_, k_, (1, 1), 1) ** 2),
                 argnums=(0, 1))(x, k)
    assert all(np.isfinite(np.asarray(gi, dtype=np.float32)).all()
               for gi in g)


@pytest.mark.parametrize("stride,dtype", [(1, jnp.float32),
                                          (2, jnp.float32),
                                          (1, jnp.bfloat16),
                                          (2, jnp.bfloat16)])
def test_hybrid_emitter_fwd_einsum_bwd_grads_match_lax(stride, dtype):
    """The >=256^2 branch's custom backward (einsum adjoint via
    linear_transpose) must equal lax.conv autodiff for input AND kernel
    grads — stride-1 and the VAE stride-2 downsample alike."""
    from dreamfusion_tpu.ops import conv as conv_mod
    old = conv_mod._LAX_CONV_MIN_PIXELS
    conv_mod._LAX_CONV_MIN_PIXELS = 8 * 8  # tiny sizes take the branch
    try:
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 12, 12, 4)), dtype)
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 5)) * 0.1, dtype)
        pad = ((1, 1), (1, 1)) if stride == 1 else ((0, 1), (0, 1))

        def loss_ours(x_, w_):
            return jnp.sum(conv_mod.mm_conv(x_, w_, (stride, stride),
                                            pad) ** 2)

        def loss_lax(x_, w_):
            out = lax_conv(x_.astype(jnp.float32), w_.astype(jnp.float32),
                           (stride, stride), pad)
            return jnp.sum(out ** 2)

        gx, gw = jax.grad(loss_ours, argnums=(0, 1))(x, w)
        rx, rw = jax.grad(loss_lax, argnums=(0, 1))(x, w)
        tol = 2e-5 if dtype == jnp.float32 else 5e-2
        np.testing.assert_allclose(np.asarray(gx, np.float32),
                                   np.asarray(rx, np.float32),
                                   rtol=tol, atol=tol)
        np.testing.assert_allclose(np.asarray(gw, np.float32),
                                   np.asarray(rw, np.float32),
                                   rtol=tol, atol=tol)
        assert gx.dtype == x.dtype and gw.dtype == w.dtype
    finally:
        conv_mod._LAX_CONV_MIN_PIXELS = old
