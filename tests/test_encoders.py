"""Encoder unit tests: freq vs oracle, SH orthonormality, hash grid vs a
brute-force numpy oracle implementing the reference indexing rules."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamfusion_tpu.ops.freq import freq_encode, freq_encode_dim
from dreamfusion_tpu.ops.hashgrid import (
    HashGridSpec, hash_encode, hashgrid_tv_loss, hashgrid_wd_loss, init_hashgrid,
)
from dreamfusion_tpu.ops.morton import morton3d, morton3d_invert, packbits, unpackbits
from dreamfusion_tpu.ops.sh import sh_encode, sh_encode_dim
from dreamfusion_tpu.ops.activation import trunc_exp


# ---------------- freq ----------------

def test_freq_encode_oracle(rng):
    x = rng.normal(size=(5, 3)).astype(np.float32)
    deg = 4
    out = np.asarray(freq_encode(jnp.asarray(x), deg))
    assert out.shape == (5, freq_encode_dim(3, deg))
    expect = [x]
    for i in range(deg):
        expect.append(np.sin(x * 2.0 ** i))
        expect.append(np.cos(x * 2.0 ** i))
    np.testing.assert_allclose(out, np.concatenate(expect, -1), atol=1e-5)


def test_freq_encode_progressive(rng):
    x = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    out = np.asarray(freq_encode(x, 4, max_level=jnp.asarray(0.5)))
    # levels 2,3 zeroed: trailing 2 bands * 2 fns * 3 dims = 12 zeros
    assert np.all(out[:, -12:] == 0)
    assert np.any(out[:, 3:15] != 0)


# ---------------- SH ----------------

def test_sh_first_bands(rng):
    d = rng.normal(size=(10, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh_encode(jnp.asarray(d.astype(np.float32)), 2))
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    np.testing.assert_allclose(out[:, 0], 0.28209479177, atol=1e-5)
    np.testing.assert_allclose(out[:, 1], -0.4886025119 * y, atol=1e-5)
    np.testing.assert_allclose(out[:, 2], 0.4886025119 * z, atol=1e-5)
    np.testing.assert_allclose(out[:, 3], -0.4886025119 * x, atol=1e-5)


@pytest.mark.parametrize("degree", [1, 3, 5, 8])
def test_sh_orthonormal(degree, rng):
    # Monte-Carlo: E_{uniform dir}[Y_i Y_j] = delta_ij / (4 pi)
    n = 200_000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    Y = np.asarray(sh_encode(jnp.asarray(d.astype(np.float32)), degree))
    G = (Y.T @ Y) / n * (4 * math.pi)
    np.testing.assert_allclose(G, np.eye(degree ** 2), atol=0.05)


# ---------------- hash grid ----------------

def _oracle_hashgrid(x, table, spec):
    """Brute-force numpy oracle: same rules as gridencoder.cu:83-240."""
    PRIMES = (1, 2654435761, 805459861)
    N = x.shape[0]
    out = np.zeros((N, spec.num_levels * spec.level_dim), np.float32)
    for n in range(N):
        if np.any(x[n] < 0) or np.any(x[n] > 1):
            continue
        for l in range(spec.num_levels):
            res = spec.resolutions[l]
            hsize = spec.level_sizes[l]
            off = spec.offsets[l]
            pos = np.clip(x[n] * res - 0.5, 0, res - 1)
            pg = np.floor(pos).astype(np.uint64)
            frac = pos - pg
            if spec.interpolation == "smoothstep":
                frac = frac * frac * (3 - 2 * frac)
            acc = np.zeros(spec.level_dim, np.float32)
            for corner in range(8):
                w = 1.0
                c = np.zeros(3, np.uint64)
                for d in range(3):
                    if corner & (1 << d):
                        w *= frac[d]
                        c[d] = min(pg[d] + 1, res - 1)
                    else:
                        w *= 1 - frac[d]
                        c[d] = pg[d]
                stride, index = 1, 0
                for d in range(3):
                    if stride > hsize:
                        break
                    index += int(c[d]) * stride
                    stride *= res
                if stride > hsize:
                    index = 0
                    for d in range(3):
                        t = (int(c[d]) * PRIMES[d]) & 0xFFFFFFFF
                        if spec.gridtype == "affine":
                            index = (index + t) & 0xFFFFFFFF
                        else:
                            index ^= t
                idx = index % hsize
                acc += w * table[off + idx]
            out[n, l * spec.level_dim:(l + 1) * spec.level_dim] = acc
    return out


def test_hashgrid_vs_oracle(key, rng):
    spec = HashGridSpec(num_levels=4, level_dim=2, base_resolution=4,
                        desired_resolution=64, log2_hashmap_size=8,
                        interpolation="linear")
    table = init_hashgrid(key, spec, scale=1.0)
    x = rng.uniform(0, 1, size=(32, 3)).astype(np.float32)
    got = np.asarray(hash_encode(jnp.asarray(x), table, spec))
    want = _oracle_hashgrid(x, np.asarray(table), spec)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_hashgrid_affine_vs_oracle(key, rng):
    """The roll-packed affine fast path must agree with the brute-force
    per-corner definition of the additive-congruential hash."""
    spec = HashGridSpec(num_levels=4, level_dim=2, base_resolution=4,
                        desired_resolution=64, log2_hashmap_size=8,
                        gridtype="affine", interpolation="linear")
    table = init_hashgrid(key, spec, scale=1.0)
    x = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)
    got = np.asarray(hash_encode(jnp.asarray(x), table, spec))
    want = _oracle_hashgrid(x, np.asarray(table), spec)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_hashgrid_affine_continuous_across_cells(key, rng):
    """Affine hashing keeps exact corner sharing: the encoding is C0 at
    cell boundaries (the property cell-local packing schemes would lose)."""
    spec = HashGridSpec(num_levels=3, level_dim=2, base_resolution=8,
                        desired_resolution=32, log2_hashmap_size=6,
                        gridtype="affine")
    table = init_hashgrid(key, spec, scale=1.0)
    res = spec.resolutions[-1]
    # points straddling a lattice plane of the finest level
    boundary = (3 + 0.5) / res       # x*res - 0.5 == 3 exactly
    eps = 1e-5
    lo = np.array([[boundary - eps, 0.4, 0.6]], np.float32)
    hi = np.array([[boundary + eps, 0.4, 0.6]], np.float32)
    a = np.asarray(hash_encode(jnp.asarray(lo), table, spec))
    b = np.asarray(hash_encode(jnp.asarray(hi), table, spec))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_hashgrid_affine_grad_flows(key, rng):
    spec = HashGridSpec(num_levels=4, level_dim=2, base_resolution=4,
                        desired_resolution=64, log2_hashmap_size=8,
                        gridtype="affine")
    table = init_hashgrid(key, spec, scale=1.0)
    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(16, 3)).astype(np.float32))

    def loss(t, x):
        return jnp.sum(hash_encode(x, t, spec) ** 2)

    gt, gx = jax.grad(loss, argnums=(0, 1))(table, x)
    assert np.isfinite(np.asarray(gt)).all()
    assert float(jnp.abs(gt).sum()) > 0
    assert np.isfinite(np.asarray(gx)).all()
    assert float(jnp.abs(gx).sum()) > 0


def test_hashgrid_smoothstep_and_oob(key, rng):
    spec = HashGridSpec(num_levels=3, level_dim=2, base_resolution=4,
                        desired_resolution=32, log2_hashmap_size=6,
                        interpolation="smoothstep")
    table = init_hashgrid(key, spec, scale=1.0)
    x = np.concatenate([
        rng.uniform(0, 1, size=(8, 3)),
        np.array([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]]),
    ]).astype(np.float32)
    got = np.asarray(hash_encode(jnp.asarray(x), table, spec))
    want = _oracle_hashgrid(x, np.asarray(table), spec)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert np.all(got[-2:] == 0)  # OOB rows zeroed


def test_hashgrid_max_level(key, rng):
    spec = HashGridSpec(num_levels=4, level_dim=2, base_resolution=4,
                        desired_resolution=64, log2_hashmap_size=8)
    table = init_hashgrid(key, spec, scale=1.0)
    x = jnp.asarray(rng.uniform(0, 1, size=(8, 3)).astype(np.float32))
    out = np.asarray(hash_encode(x, table, spec, max_level=jnp.asarray(0.5)))
    assert np.all(out[:, 4:] == 0)       # levels 2,3 masked
    assert np.any(out[:, :4] != 0)


def test_hashgrid_grad_flows(key, rng):
    spec = HashGridSpec(num_levels=2, level_dim=2, base_resolution=4,
                        desired_resolution=8, log2_hashmap_size=6)
    table = init_hashgrid(key, spec, scale=1.0)
    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(16, 3)).astype(np.float32))

    def loss(t):
        return jnp.sum(hash_encode(x, t, spec) ** 2)

    g = jax.grad(loss)(table)
    assert np.asarray(jnp.abs(g)).sum() > 0
    # numeric check on one coordinate
    eps = 1e-3
    i = int(np.argmax(np.abs(np.asarray(g)[:, 0])))
    tp = table.at[i, 0].add(eps)
    tm = table.at[i, 0].add(-eps)
    fd = (loss(tp) - loss(tm)) / (2 * eps)
    np.testing.assert_allclose(fd, g[i, 0], rtol=2e-2, atol=1e-3)


def test_hashgrid_regularizers(key):
    spec = HashGridSpec(num_levels=2, level_dim=2, base_resolution=4,
                        desired_resolution=8, log2_hashmap_size=6)
    table = init_hashgrid(key, spec, scale=1.0)
    tv = hashgrid_tv_loss(key, table, spec, n_samples=64)
    wd = hashgrid_wd_loss(table, spec)
    assert float(tv) >= 0 and float(wd) > 0
    assert np.isfinite(float(tv))
    g = jax.grad(lambda t: hashgrid_wd_loss(t, spec))(table)
    assert np.asarray(jnp.abs(g)).sum() > 0


# ---------------- morton / packbits ----------------

def test_morton_roundtrip(rng):
    c = rng.integers(0, 128, size=(64, 3)).astype(np.uint32)
    codes = morton3d(jnp.asarray(c))
    back = np.asarray(morton3d_invert(codes))
    np.testing.assert_array_equal(back, c)
    # spot-check: (1,0,0)->1, (0,1,0)->2, (0,0,1)->4
    np.testing.assert_array_equal(
        np.asarray(morton3d(jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.uint32))),
        [1, 2, 4])


def test_packbits_roundtrip(rng):
    g = rng.uniform(0, 20, size=(2, 128)).astype(np.float32)
    bf = packbits(jnp.asarray(g), jnp.asarray(10.0))
    got = np.asarray(unpackbits(bf))
    np.testing.assert_array_equal(got, g > 10.0)


# ---------------- trunc_exp ----------------

def test_trunc_exp_clamps_grad():
    g = jax.grad(lambda x: trunc_exp(x))(20.0)
    np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-6)
    g2 = jax.grad(lambda x: trunc_exp(x))(2.0)
    np.testing.assert_allclose(g2, np.exp(2.0), rtol=1e-6)
