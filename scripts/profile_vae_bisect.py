"""Bisect the VAE-encoder backward (scan-chained).

profile_vae_bwd.py showed the encode backward costs ~23-28 ms under BOTH
conv implementations (einsum and emitter) while the forward is 8.5 ms —
so conv lowering is not the bottleneck.  This probe times synthetic chains
replicating the encoder's exact conv shapes:

  C  convs only                      (what the MXU should cost)
  CG convs + fp32 GroupNorm + SiLU   (the real per-block glue)
  CB convs + bf16 GroupNorm + SiLU   (glue with halved stats traffic)

each forward-only and fwd+bwd (grad wrt the input image), under the
current conv dispatch.  Set EMITTER_BWD=1 to time the emitter's own
transpose convs instead of the einsum-adjoint hybrid.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def scan_time(make_fn, K, *args):
    fn = jax.jit(make_fn(K))
    out = fn(*args)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        float(out)
    return (time.time() - t0) / reps


def per_iter(make_fn, *args):
    t1 = scan_time(make_fn, 1, *args)
    t9 = scan_time(make_fn, 9, *args)
    return (t9 - t1) / 8


# SD VAE encoder conv inventory: (channels_in, channels_out, stride)
# grouped by spatial size at 512^2 input
LEVELS = [
    (512, [(3, 128, 1), (128, 128, 1), (128, 128, 1), (128, 128, 1),
           (128, 128, 1), (128, 128, 2)]),
    (256, [(128, 256, 1), (256, 256, 1), (256, 256, 1), (256, 256, 1),
           (256, 256, 2)]),
    (128, [(256, 512, 1), (512, 512, 1), (512, 512, 1), (512, 512, 1),
           (512, 512, 2)]),
    (64, [(512, 512, 1), (512, 512, 1), (512, 512, 1), (512, 512, 1),
          (512, 512, 1), (512, 512, 1), (512, 8, 1)]),
]


def build_params(key):
    from dreamfusion_tpu.ops.conv import mm_conv  # noqa: F401
    ps = []
    for res, convs in LEVELS:
        for ci, co, s in convs:
            key, k = jax.random.split(key)
            ps.append(jax.random.normal(k, (3, 3, ci, co),
                                        jnp.bfloat16) * 0.05)
    return ps


def make_chain(glue: str):
    """glue: none | gn32 | gnbf16"""
    import flax.linen as nn
    from dreamfusion_tpu.ops.conv import mm_conv

    def groupnorm(h, dtype):
        g = 32
        while h.shape[-1] % g:
            g //= 2
        B, H, W, C = h.shape
        hg = h.astype(dtype).reshape(B, H, W, g, C // g)
        mu = jnp.mean(hg, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean((hg - mu) ** 2, axis=(1, 2, 4), keepdims=True)
        hg = (hg - mu) * jax.lax.rsqrt(var + 1e-5)
        return hg.reshape(B, H, W, C).astype(h.dtype)

    def chain(params, x):
        i = 0
        h = x.astype(jnp.bfloat16)
        for res, convs in LEVELS:
            for ci, co, s in convs:
                if glue == "gn32" and ci > 3:
                    h = nn.silu(groupnorm(h, jnp.float32))
                elif glue == "gnbf16" and ci > 3:
                    h = nn.silu(groupnorm(h, jnp.bfloat16))
                h = mm_conv(h, params[i], (s, s),
                            ((1, 1 if s == 1 else 0),
                             (1, 1 if s == 1 else 0)) if s == 2 else
                            ((1, 1), (1, 1))).astype(jnp.bfloat16)
                i += 1
        return h
    return chain


def main():
    from dreamfusion_tpu.ops import conv as conv_mod
    if os.environ.get("EMITTER_BWD"):
        conv_mod._EMITTER_BWD = True
        print("(emitter transpose backward)")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    warm = jax.jit(lambda x: jnp.sum(x * 2))
    for i in range(3):
        float(warm(jnp.ones((8, 8)) * i))

    params = build_params(jax.random.PRNGKey(0))
    params = jax.device_put(params)
    jax.block_until_ready(params)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 512, 3))

    for label, glue in [("C  convs only", "none"),
                        ("CG +fp32 gn/silu", "gn32"),
                        ("CB +bf16 gn/silu", "gnbf16")]:
        chain = make_chain(glue)

        def make_fwd(K):
            def run(params, x0):
                def body(carry, i):
                    h = chain(params, jnp.clip(x0 + 1e-6 * carry, 0, 1))
                    return jnp.sum(h.astype(jnp.float32)) * 1e-9, None
                s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
                return s
            return run

        def make_grad(K):
            def run(params, x0):
                def body(carry, i):
                    def f(img):
                        h = chain(params, img)
                        return jnp.sum(h.astype(jnp.float32))
                    v, g = jax.value_and_grad(f)(
                        jnp.clip(x0 + 1e-6 * carry, 0, 1))
                    return v * 1e-9 + jnp.sum(
                        g.astype(jnp.float32)) * 1e-9, None
                s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
                return s
            return run

        pf = per_iter(make_fwd, params, x0)
        pg = per_iter(make_grad, params, x0)
        print(f"{label:18s} fwd={pf*1e3:7.2f}ms  fwd+bwd={pg*1e3:7.2f}ms  "
              f"(bwd ~{(pg-pf)*1e3:6.2f}ms)", flush=True)


if __name__ == "__main__":
    main()
