"""ops/attention.py: chunked online-softmax vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.ops.attention import attention, chunked_attention


def _dense(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) / (d ** 0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p.astype(q.dtype), v)


@pytest.mark.parametrize("B,N,h,d,chunk", [
    (2, 256, 4, 32, 64),
    (1, 1024, 5, 64, 512),
    (2, 128, 2, 16, 128),   # single chunk
])
def test_chunked_matches_dense(B, N, h, d, chunk):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, N, h, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, N, h, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, N, h, d))
    out = chunked_attention(q, k, v, chunk=chunk)
    ref = _dense(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_chunked_bf16_close():
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (2, 512, 4, 64), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape, jnp.bfloat16)
    out = chunked_attention(q, k, v, chunk=128).astype(jnp.float32)
    ref = _dense(q.astype(jnp.float32), k.astype(jnp.float32),
                 v.astype(jnp.float32))
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_chunked_grad_matches_dense():
    key = jax.random.PRNGKey(4)
    q = jax.random.normal(key, (1, 256, 2, 32))
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape)
    g1 = jax.grad(lambda q: jnp.sum(chunked_attention(q, k, v, chunk=64) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(_dense(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-4)


def test_dispatch_short_seq_uses_dense_path():
    # cross-attention shape (77 ctx tokens) must not hit the chunk assert
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (2, 4096, 5, 64))[:, :64]
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 77, 5, 64))
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 77, 5, 64))
    out = attention(q, k, v)
    assert out.shape == q.shape


def test_chunk_divisibility_error():
    q = jnp.zeros((1, 100, 2, 16))
    with pytest.raises(ValueError):
        chunked_attention(q, q, q, chunk=64)
