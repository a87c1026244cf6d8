"""Compile-only bisect of the libtpu SIGILL triggered by the analytic
normal path inside the train step. Each probe compiles (no run) at the
full training size; the first one to crash the compile service names the
toxic construct. Run one probe: python scripts/probe_sigill.py P1"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main(which):
    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.models.nerf import SHADING_IDS
    from dreamfusion_tpu.models.renderer import RenderFlags
    from dreamfusion_tpu.training.trainer import Trainer
    from dreamfusion_tpu.core.math import safe_normalize

    cfg = finalize(Config(
        text="x", workspace="/tmp/dftpu_prof", backbone="triplane",
        w=64, h=64, fp16=True, seed=0))
    tr = Trainer(cfg, guidances={}, guidance_params={}, embeddings={})
    state = tr.init_state(jax.random.PRNGKey(0))
    field = tr.renderer.field if hasattr(tr.renderer, "field") else None
    renderer = tr.renderer
    N = 4096 * 96
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3),
                           minval=-0.9, maxval=0.9)
    R = 4096
    ro = jnp.broadcast_to(jnp.array([0.0, 0.0, 3.2]), (R, 3))
    rd = safe_normalize(jnp.ones((R, 3)))

    def p1(params):
        # field-only: grad of analytic-normal outputs wrt params
        def loss(p):
            s, a, n = renderer.apply(
                {"params": p}, x, method=lambda m, xx:
                m.field.common_with_normal(xx, None))
            return jnp.sum(s) + jnp.sum(a) + jnp.sum(n * n)
        return jax.grad(loss)(params)

    def p2(params):
        # full shaded field __call__ (traced shading select) grad
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), x.shape)
        def loss(p):
            s, c, n = renderer.apply(
                {"params": p}, x, d, d, 0.5,
                jnp.asarray(SHADING_IDS["lambertian"]),
                method=lambda m, *a: m.field(*a))
            return jnp.sum(s) + jnp.sum(c.astype(jnp.float32))
        return jax.grad(loss)(params)

    def p3(params):
        # full render grad (march + shade + composite), no scan/optimizer
        flags = RenderFlags(perturb=True)
        def loss(p):
            out = renderer.apply(
                {"params": p}, flags, ro, rd, occ_grid=state.occ_grid,
                light_d=safe_normalize(ro), ambient_ratio=0.5,
                shading=jnp.asarray(SHADING_IDS["lambertian"]),
                bg_color=jnp.zeros((R, 3)), use_bg_net=jnp.asarray(False),
                rngs={"render": jax.random.PRNGKey(2)},
                method=renderer.render)
            return jnp.sum(out["image"]) + jnp.sum(out["weights_sum"])
        return jax.grad(loss)(params)

    def p4(params):
        # p3 wrapped in a 1-iteration scan + optimizer update (the T2 shape)
        from dreamfusion_tpu.training.trainer import apply_updates_guarded
        flags = RenderFlags(perturb=True)
        def step(st, i):
            def loss(p):
                out = renderer.apply(
                    {"params": p}, flags, ro, rd, occ_grid=st.occ_grid,
                    light_d=safe_normalize(ro), ambient_ratio=0.5,
                    shading=jnp.asarray(SHADING_IDS["lambertian"]),
                    bg_color=jnp.zeros((R, 3)), use_bg_net=jnp.asarray(False),
                    rngs={"render": jax.random.fold_in(jax.random.PRNGKey(2), i)},
                    method=renderer.render)
                return jnp.sum(out["image"]) + jnp.sum(out["weights_sum"])
            loss_v, grads = jax.value_and_grad(loss)(st.params)
            return apply_updates_guarded(tr.optimizer, cfg, st, grads), loss_v
        def run(st):
            st, losses = jax.lax.scan(step, st, jnp.arange(1))
            return st.step, jnp.sum(losses)
        return run

    from dreamfusion_tpu.ops.triplane import TriplaneSpec
    tspec = TriplaneSpec(resolution=cfg.triplane_resolution,
                         channels=cfg.triplane_channels,
                         num_scales=cfg.triplane_scales)

    def p1a(params):
        # encoder-with-xgrad only, no MLP
        from dreamfusion_tpu.ops.triplane import triplane_encode_with_xgrad
        def loss(p):
            u = (x + 1.0) / 2.0
            feat, (jx, jy, jz) = triplane_encode_with_xgrad(
                u, p["field"]["triplanes"], tspec, out_dtype=jnp.bfloat16)
            return (jnp.sum(feat.astype(jnp.float32)) +
                    jnp.sum((jx + jy + jz).astype(jnp.float32)))
        return jax.grad(loss)(params)

    def p1b(params):
        # encoder + MLP fwd + jacobian reduce, but NO head_vjp/act_vjp
        from dreamfusion_tpu.ops.triplane import triplane_encode_with_xgrad
        def loss(p):
            u = (x + 1.0) / 2.0
            feat, (jx, jy, jz) = triplane_encode_with_xgrad(
                u, p["field"]["triplanes"], renderer.field.triplane_spec,
                out_dtype=jnp.bfloat16)
            h = renderer.apply(
                {"params": p}, feat,
                method=lambda m, f: m.field.sigma_net(f)).astype(jnp.float32)
            g = jnp.stack([jnp.sum(h[:, :1] * j[:, :1].astype(jnp.float32) +
                                   j.astype(jnp.float32).sum(-1, keepdims=True) * 0,
                                   axis=-1)
                           for j in (jx, jy, jz)], axis=-1)
            gg = jnp.stack([jnp.sum(j.astype(jnp.float32), axis=-1)
                            for j in (jx, jy, jz)], axis=-1)
            n = safe_normalize(-(gg + g))
            return jnp.sum(h) + jnp.sum(jnp.nan_to_num(n) ** 2)
        return jax.grad(loss)(params)

    def p1c(params):
        # full analytic path but without the activation vjp scale
        def loss(p):
            s, a, n = renderer.apply(
                {"params": p}, x, method=lambda m, xx:
                m.field.common_with_normal(xx, None))
            return jnp.sum(s) + jnp.sum(a)   # normals unused -> DCE test
        return jax.grad(loss)(params)

    def p1d(params):
        # normals live but WITHOUT safe_normalize/nan_to_num: raw -g
        def loss(p):
            def raw(m, xx):
                import jax as _jax
                import jax.numpy as _jnp
                f = m.field
                u = (xx + f.bound) / (2 * f.bound)
                from dreamfusion_tpu.ops.triplane import (
                    triplane_encode_with_xgrad)
                feat, (jx, jy, jz) = triplane_encode_with_xgrad(
                    u, f.triplanes, f.triplane_spec,
                    out_dtype=f.compute_dtype)
                def head(ff):
                    return f.sigma_net(ff).astype(_jnp.float32)
                h, head_vjp = _jax.vjp(head, feat)
                ct = _jnp.concatenate([_jnp.ones_like(h[..., :1]),
                                       _jnp.zeros_like(h[..., 1:])], -1)
                (dh0,) = head_vjp(ct)
                dh = dh0.astype(_jnp.float32)
                g = _jnp.stack([_jnp.sum(dh * j.astype(_jnp.float32), -1)
                                for j in (jx, jy, jz)], -1)
                return _jnp.sum(h), g
            hsum, g = renderer.apply({"params": p}, x, method=raw)
            return hsum + jnp.sum(g * g)
        return jax.grad(loss)(params)

    def _raw_g(stop_dh):
        def raw(m, xx):
            import jax as _jax
            import jax.numpy as _jnp
            f = m.field
            u = (xx + f.bound) / (2 * f.bound)
            from dreamfusion_tpu.ops.triplane import triplane_encode_with_xgrad
            feat, (jx, jy, jz) = triplane_encode_with_xgrad(
                u, f.triplanes, f.triplane_spec, out_dtype=f.compute_dtype)
            def head(ff):
                return f.sigma_net(ff).astype(_jnp.float32)
            h, head_vjp = _jax.vjp(head, feat)
            ct = _jnp.concatenate([_jnp.ones_like(h[..., :1]),
                                   _jnp.zeros_like(h[..., 1:])], -1)
            (dh0,) = head_vjp(ct)
            if stop_dh:
                dh0 = _jax.lax.stop_gradient(dh0)
            dh = dh0.astype(_jnp.float32)
            g = _jnp.stack([_jnp.sum(dh * j.astype(_jnp.float32), -1)
                            for j in (jx, jy, jz)], -1)
            return _jnp.sum(h), g
        return raw

    def p1e(params):
        # like P1d but dh0 stop-gradient'd: no second order through the vjp
        def loss(p):
            hsum, g = renderer.apply({"params": p}, x, method=_raw_g(True))
            return hsum + jnp.sum(g * g)
        return jax.grad(loss)(params)

    def p1f(params):
        # multiply-reduce structure with feat instead of any vjp output
        from dreamfusion_tpu.ops.triplane import triplane_encode_with_xgrad
        def loss(p):
            u = (x + 1.0) / 2.0
            feat, (jx, jy, jz) = triplane_encode_with_xgrad(
                u, p["field"]["triplanes"], tspec, out_dtype=jnp.bfloat16)
            ff = feat.astype(jnp.float32)
            g = jnp.stack([jnp.sum(ff * j.astype(jnp.float32), -1)
                           for j in (jx, jy, jz)], -1)
            return jnp.sum(g * g)
        return jax.grad(loss)(params)

    def p1g(params):
        # JVP formulation: directional derivatives via forward-mode (no
        # transposed MLP in the forward)
        def raw(m, xx):
            import jax as _jax
            import jax.numpy as _jnp
            f = m.field
            u = (xx + f.bound) / (2 * f.bound)
            from dreamfusion_tpu.ops.triplane import triplane_encode_with_xgrad
            feat, (jx, jy, jz) = triplane_encode_with_xgrad(
                u, f.triplanes, f.triplane_spec, out_dtype=f.compute_dtype)
            def head(ff):
                return f.sigma_net(ff).astype(_jnp.float32)
            outs = []
            h = None
            for j in (jx, jy, jz):
                h, t = _jax.jvp(head, (feat,), (j.astype(feat.dtype),))
                outs.append(t[..., 0])
            g = _jnp.stack(outs, -1)
            from dreamfusion_tpu.core.math import safe_normalize as _sn
            n = _jnp.nan_to_num(_sn(-g))
            return _jnp.sum(h), n
        def loss(p):
            hsum, n = renderer.apply({"params": p}, x, method=raw)
            return hsum + jnp.sum(n * n)
        return jax.grad(loss)(params)

    probes = {"P1": p1, "P2": p2, "P3": p3,
              "P1a": p1a, "P1b": p1b, "P1c": p1c, "P1d": p1d,
              "P1e": p1e, "P1f": p1f, "P1g": p1g}
    t0 = time.time()
    if which == "P4":
        fn = jax.jit(p4(state.params))
        lowered = fn.lower(state)
    else:
        fn = jax.jit(probes[which])
        lowered = fn.lower(state.params)
    print(f"{which} lowered, compiling...", flush=True)
    lowered.compile()
    print(f"{which} COMPILED OK in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "P1")
