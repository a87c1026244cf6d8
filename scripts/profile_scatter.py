"""Scatter-add strategy bench at triplane-backward shapes (scan-chained).

The triplane backward splats N=393k sample grads into 3 planes of
[256,256,4C=64] (quad-packed) — 1.18M scatter rows ≈ 70 ms at the
measured ~60 ns/row. Candidates:

  W0 XLA scatter-add (current: zeros.at[ids].add(vals))
  W1 bilinear-separable dense matmul: grad[i,j,c] = sum_n A[n,i] B[n,j] g[n,c]
     computed as einsum('ni,njc->ijc') with njc blocked via scan
  W2 W1 via per-channel einsum ('ni,nj,n->ij' x C) — XLA chooses the path
  W3 scatter-add with f32 vs bf16 rows (dtype sensitivity)

W1/W2 compute the UNPACKED [256,256,C=16] grad directly from bilinear
weights (A/B have 2 nonzeros each); W0 scatters quad-packed 4C rows.
Equal information; whichever wins becomes the triplane custom_vjp.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

R = 256
C = 16
N = 4096 * 96          # rays x samples
PLANES = 3


def scan_time(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        float(out)
    return (time.time() - t0) / reps


def chain(body_fn, K):
    @jax.jit
    def run(*args):
        def body(carry, i):
            out = body_fn(carry, i, *args)
            return out, None
        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return s
    return run


def main():
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (N, PLANES), 0, R * R)  # per-plane texel
    ids3 = ids + jnp.arange(PLANES)[None, :] * (R * R)    # flat over planes
    g4 = jax.random.normal(jax.random.fold_in(key, 1), (N, PLANES, 4 * C),
                           jnp.float32)
    frac = jax.random.uniform(jax.random.fold_in(key, 2), (N, PLANES, 2))
    gc = jax.random.normal(jax.random.fold_in(key, 3), (N, PLANES, C),
                           jnp.float32)

    # W0: flat scatter-add, quad-packed rows (what autodiff of the current
    # gather produces)
    def w0(carry, i, ids3, g4):
        vals = (g4 + carry).reshape(N * PLANES, 4 * C)
        tbl = jnp.zeros((PLANES * R * R, 4 * C), jnp.float32)
        tbl = tbl.at[ids3.reshape(-1)].add(vals)
        return jnp.sum(tbl ** 2), None

    def w0b(carry, i, ids3, g4):
        vals = (g4 + carry).astype(jnp.bfloat16).reshape(N * PLANES, 4 * C)
        tbl = jnp.zeros((PLANES * R * R, 4 * C), jnp.bfloat16)
        tbl = tbl.at[ids3.reshape(-1)].add(vals)
        return jnp.sum(tbl.astype(jnp.float32) ** 2), None

    # W1: separable bilinear one-hot matmul, blocked over samples.
    iy = ids // R
    ix = ids % R

    def bilin_onehot(idx, f):
        # [N, R] with weight (1-f) at idx and f at idx+1 (edge-clamped)
        a = jax.nn.one_hot(idx, R, dtype=jnp.bfloat16) * (1 - f)[..., None]
        b = jax.nn.one_hot(jnp.minimum(idx + 1, R - 1), R,
                           dtype=jnp.bfloat16) * f[..., None]
        return a + b

    def w1(carry, i, iy, ix, frac, gc):
        total = jnp.float32(0)
        BLK = 16384
        nblk = N // BLK
        iy_b = iy.reshape(nblk, BLK, PLANES)
        ix_b = ix.reshape(nblk, BLK, PLANES)
        fr_b = frac.reshape(nblk, BLK, PLANES, 2)
        gc_b = gc.reshape(nblk, BLK, PLANES, C)

        def blk(acc, args):
            iyb, ixb, frb, gb = args
            A = bilin_onehot(iyb, frb[..., 0])        # [BLK, P, R]
            Bm = bilin_onehot(ixb, frb[..., 1])       # [BLK, P, R]
            gbb = (gb + carry).astype(jnp.bfloat16)
            O = jnp.einsum("npj,npc->npjc", Bm, gbb)  # [BLK, P, R, C]
            acc = acc + jnp.einsum("npi,npjc->pijc", A,
                                   O.reshape(BLK, PLANES, R, C),
                                   preferred_element_type=jnp.float32)
            return acc, None

        acc0 = jnp.zeros((PLANES, R, R, C), jnp.float32)
        acc, _ = jax.lax.scan(blk, acc0, (iy_b, ix_b, fr_b, gc_b))
        return jnp.sum(acc ** 2), None

    # W2: per-channel contraction, full N at once (XLA picks the order)
    def w2(carry, i, iy, ix, frac, gc):
        A = bilin_onehot(iy, frac[..., 0])            # [N, P, R]
        Bm = bilin_onehot(ix, frac[..., 1])           # [N, P, R]
        gb = (gc + carry).astype(jnp.bfloat16)
        out = jnp.einsum("npi,npj,npc->pijc", A, Bm, gb,
                         preferred_element_type=jnp.float32)
        return jnp.sum(out ** 2), None

    for name, fn, args in [
        ("W0_scatter_f32", w0, (ids3, g4)),
        ("W0b_scatter_bf16", w0b, (ids3, g4)),
        ("W1_blocked_mm", w1, (iy, ix, frac, gc)),
        ("W2_einsum3", w2, (iy, ix, frac, gc)),
    ]:
        def body(carry, i, *a):
            out, _ = fn(carry, i, *a)
            return out * 1e-20
        try:
            t1 = scan_time(chain(body, 1), *args)
            t5 = scan_time(chain(body, 5), *args)
            per = (t5 - t1) / 4
            print(f"{name:18s} scan1={t1*1e3:8.1f} scan5={t5*1e3:8.1f} "
                  f"per-iter={per*1e3:8.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
