"""Decisive test: is the per-program first-execution tax proportional to
the number of ARGUMENT/RESULT BUFFERS (not program size)?

probe_fence_tax.py decomposed RUN_r04's 744 s startup into a fixed 172 s
session tax + per-program costs that track leaf counts (guidance tree
~1130 leaves → 140 s; fused steps ~1200 arg buffers → 56-63 s; the much
BIGGER 800² eval program with ~80 args → 2.4 s).  Here: one tiny matmul
absorbs the session tax, then identical trivial programs taking N scalar
args (N = 16 / 128 / 1024) are timed on first + second execution, then a
program RETURNING 1024 buffers — isolating arg-count, result-count, and
byte-size axes.

Run on the real TPU:  python scripts/probe_buffer_tax.py
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.sum(x if hasattr(x, "dtype") else x[0]))


def timed(name, f):
    t = time.time()
    r = f()
    dt = time.time() - t
    print(f"[buf] {name}: {dt:.2f}s", flush=True)
    return r, round(dt, 2)


def main():
    out = {}
    print(jax.devices(), flush=True)
    _, out["session_tiny"] = timed(
        "session tiny", lambda: fence(jnp.ones((8, 8)) @ jnp.ones((8, 8))))

    for n in (16, 128, 1024):
        args = [jnp.float32(i) for i in range(n)]

        @jax.jit
        def many_args(*xs):
            s = xs[0]
            for x in xs[1:]:
                s = s + x
            return s

        _, out[f"args{n}_first"] = timed(
            f"{n}-scalar-args first", lambda: fence(many_args(*args)))
        args2 = [jnp.float32(i + 1) for i in range(n)]
        _, out[f"args{n}_second"] = timed(
            f"{n}-scalar-args second", lambda: fence(many_args(*args2)))

    @jax.jit
    def many_results(x):
        return [x + i for i in range(1024)]

    x = jnp.float32(3.0)
    _, out["results1024_first"] = timed(
        "1024-results first", lambda: fence(many_results(x)[-1]))
    _, out["results1024_second"] = timed(
        "1024-results second", lambda: fence(many_results(x + 1)[-1]))

    # byte-size control: 32 args × 64 MB = 2 GB of input bytes, few buffers
    big = [jnp.ones((4096, 4096), jnp.float32) * i for i in range(32)]
    fence(big[-1])  # materialize before timing the program

    @jax.jit
    def big_args(*xs):
        return sum(x[0, 0] for x in xs)

    _, out["big32x64MB_first"] = timed(
        "32×64MB-args first", lambda: fence(big_args(*big)))
    big2 = [b + 1 for b in big]
    fence(big2[-1])
    _, out["big32x64MB_second"] = timed(
        "32×64MB-args second", lambda: fence(big_args(*big2)))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
