"""ops/resize.py matmul bilinear vs jax.image.resize oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.ops.resize import resize_bilinear


@pytest.mark.parametrize("hin,hout", [(64, 512), (64, 8), (16, 512),
                                      (33, 77), (512, 64)])
def test_matches_jax_image_resize(hin, hout):
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, hin, hin, 3))
    out = resize_bilinear(x, (hout, hout))
    ref = jax.image.resize(x, (2, hout, hout, 3), method="bilinear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_identity_and_grad():
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 2))
    assert resize_bilinear(x, (8, 8)) is x
    g = jax.grad(lambda x: jnp.sum(resize_bilinear(x, (32, 32)) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(
        jax.image.resize(x, (1, 32, 32, 2), "bilinear") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               atol=1e-4, rtol=1e-4)


def test_rect_shapes():
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 24, 4))
    out = resize_bilinear(x, (40, 12))
    ref = jax.image.resize(x, (1, 40, 12, 4), method="bilinear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
