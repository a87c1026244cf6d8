"""Fused GroupNorm (custom_vjp backward) vs flax nn.GroupNorm oracle."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.models.unet import GroupNorm32, group_norm_fused


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 32), 8),
                                          ((1, 5, 7, 12), 4),
                                          ((3, 16), 2),
                                          ((2, 4, 4, 64), 32)])
def test_group_norm_fused_forward_matches_flax(shape, groups):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape) * 3.0 + 1.0
    scale = jax.random.normal(jax.random.fold_in(key, 1),
                              (shape[-1],)) * 0.5 + 1.0
    bias = jax.random.normal(jax.random.fold_in(key, 2), (shape[-1],))
    ours = group_norm_fused(x, scale, bias, groups, 1e-5)
    ref_mod = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    ref = ref_mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_group_norm_fused_grads_match_autodiff(dtype):
    """dx/dscale/dbias from the hand-derived backward vs flax autodiff."""
    key = jax.random.PRNGKey(3)
    shape, groups = (2, 6, 6, 16), 4
    x = (jax.random.normal(key, shape) * 2.0).astype(dtype)
    scale = jax.random.normal(jax.random.fold_in(key, 1),
                              (shape[-1],)) * 0.3 + 1.0
    bias = jax.random.normal(jax.random.fold_in(key, 2), (shape[-1],))
    cot = jax.random.normal(jax.random.fold_in(key, 3), shape)

    def loss_ours(x, s, b):
        return jnp.sum(group_norm_fused(x, s, b, groups, 1e-5) * cot)

    def loss_ref(x, s, b):
        y = nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                         dtype=jnp.float32).apply(
            {"params": {"scale": s, "bias": b}}, x.astype(jnp.float32))
        return jnp.sum(y * cot)

    go = jax.grad(loss_ours, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    for a, b_ in zip(go, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=tol, atol=tol)
    assert go[0].dtype == dtype


def test_groupnorm32_fused_param_tree_matches_flax():
    """_GN_FUSED must not change param names/shapes (checkpoint compat)."""
    from dreamfusion_tpu.models import unet as unet_mod
    x = jnp.ones((1, 4, 4, 8))
    old = unet_mod._GN_FUSED
    try:
        unet_mod._GN_FUSED = True
        p_fused = GroupNorm32().init(jax.random.PRNGKey(0), x)["params"]
        y1 = GroupNorm32().apply({"params": p_fused}, x + 0.5)
        unet_mod._GN_FUSED = False
        p_flax = GroupNorm32().init(jax.random.PRNGKey(0), x)["params"]
        y2 = GroupNorm32().apply({"params": p_fused}, x + 0.5)
    finally:
        unet_mod._GN_FUSED = old
    assert jax.tree_util.tree_structure(p_fused) == \
        jax.tree_util.tree_structure(p_flax)
    # and the two implementations agree on the same params
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-5, atol=2e-5)
