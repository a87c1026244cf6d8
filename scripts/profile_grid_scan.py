"""Scan-chained attribution of the hash-grid backbone's 3.32 it/s step.

VERDICT r3 #7: grid (L8C4 affine) runs 3.32 it/s vs the triplane flagship's
12.5 — either get >5 it/s or prove the floor.  This script prices each
suspect at the step's real shapes (4096 rays × 32 fine samples = 131k
points) with the only trustworthy method on this backend (CLAUDE.md
gotcha 7): K data-dependent iterations inside one jit, per-iter =
(t_scan9 − t_scan1)/8, outputs squared so the backward isn't loop-hoisted.

Pieces:
  E*: encoder fwd / fwd+bwd for hash_encode vs triplane_encode at 131k
  M*: sigma_net MLP fwd+bwd at 131k (both backbones share it)
  S*: full no-guidance train step per backbone (render fwd+bwd+Adan)

Run on the TPU: python scripts/profile_grid_scan.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def scan_pair(make, K1=1, K2=5, reps=3):
    """Per-iter seconds via (t_K2 − t_K1)/(K2 − K1)."""
    f1, f2 = make(K1), make(K2)
    ts = []
    for f in (f1, f2):
        float(f(jnp.float32(1.0)))  # compile + warm
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            float(f(jnp.float32(1.0)))
            best = min(best, time.time() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (K2 - K1)


def main():
    from dreamfusion_tpu.ops.hashgrid import (HashGridSpec, hash_encode,
                                              init_hashgrid)
    from dreamfusion_tpu.ops.triplane import (TriplaneSpec, init_triplane,
                                              triplane_encode)

    key = jax.random.PRNGKey(0)
    N = 4096 * 32

    # sacrificial program (gotcha 9)
    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    specs = {
        "hash_L8C4_affine": HashGridSpec(num_levels=8, level_dim=4,
                                         log2_hashmap_size=19,
                                         desired_resolution=2048,
                                         gridtype="affine"),
        "hash_L16C2_affine": HashGridSpec(num_levels=16, level_dim=2,
                                          log2_hashmap_size=19,
                                          desired_resolution=2048,
                                          gridtype="affine"),
        "hash_L4C8_affine": HashGridSpec(num_levels=4, level_dim=8,
                                         log2_hashmap_size=19,
                                         desired_resolution=2048,
                                         gridtype="affine"),
    }
    x0 = jax.random.uniform(key, (N, 3))

    results = {}
    for name, spec in specs.items():
        table = init_hashgrid(key, spec)
        table = jax.device_put(table)

        def make_fwd(K, spec=spec, table=table):
            @jax.jit
            def run(s):
                def body(carry, i):
                    x = jnp.mod(x0 + carry * 0.001 + i * 0.0003, 1.0)
                    h = hash_encode(x, table, spec, out_dtype=jnp.bfloat16)
                    return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-9, i
                c, _ = jax.lax.scan(body, s, jnp.arange(K))
                return c
            return run

        def make_bwd(K, spec=spec, table=table):
            @jax.jit
            def run(s):
                def body(carry, i):
                    x = jnp.mod(x0 + carry * 0.001 + i * 0.0003, 1.0)

                    def loss(t):
                        h = hash_encode(x, t, spec, out_dtype=jnp.bfloat16)
                        return jnp.sum(h.astype(jnp.float32) ** 2)

                    l, g = jax.value_and_grad(loss)(table)
                    return l * 1e-9 + jnp.sum(g[:8, 0]) * 1e-12, i
                c, _ = jax.lax.scan(body, s, jnp.arange(K))
                return c
            return run

        results[f"E_fwd {name}"] = scan_pair(make_fwd)
        print(f"{name}: fwd {results[f'E_fwd {name}']*1e3:.2f} ms",
              flush=True)
        results[f"E_fwdbwd {name}"] = scan_pair(make_bwd)
        print(f"{name}: fwd+bwd {results[f'E_fwdbwd {name}']*1e3:.2f} ms",
              flush=True)

    tspec = TriplaneSpec(resolution=256, channels=16, num_scales=1)
    tp = jax.device_put(init_triplane(key, tspec))

    def make_tp_fwd(K):
        @jax.jit
        def run(s):
            def body(carry, i):
                x = jnp.mod(x0 + carry * 0.001 + i * 0.0003, 1.0)
                h = triplane_encode(x, tp, tspec, out_dtype=jnp.bfloat16)
                return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-9, i
            c, _ = jax.lax.scan(body, s, jnp.arange(K))
            return c
        return run

    def make_tp_bwd(K):
        @jax.jit
        def run(s):
            def body(carry, i):
                x = jnp.mod(x0 + carry * 0.001 + i * 0.0003, 1.0)

                def loss(t):
                    h = triplane_encode(x, t, tspec, out_dtype=jnp.bfloat16)
                    return jnp.sum(h.astype(jnp.float32) ** 2)

                l, g = jax.value_and_grad(loss)(tp)
                return l * 1e-9 + jnp.sum(
                    jax.tree_util.tree_leaves(g)[0].reshape(-1)[:8]) * 1e-12, i
            c, _ = jax.lax.scan(body, s, jnp.arange(K))
            return c
        return run

    results["E_fwd triplane"] = scan_pair(make_tp_fwd)
    results["E_fwdbwd triplane"] = scan_pair(make_tp_bwd)
    print(f"triplane(flagship spec): fwd {results['E_fwd triplane']*1e3:.2f}"
          f" ms, fwd+bwd {results['E_fwdbwd triplane']*1e3:.2f} ms",
          flush=True)

    print({k: round(v * 1e3, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
