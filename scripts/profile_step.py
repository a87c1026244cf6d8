"""Decompose the flagship fused-step cost into components on the attached
TPU: NeRF render fwd+bwd, resize, VAE encode fwd+bwd, UNet CFG forward.

Per CLAUDE.md gotcha #7: every timed call varies its inputs and fetches a
scalar, so XLA/backend memoization can't fake a ~0 ms reading.

Usage: python scripts/profile_step.py [--hw 64] [--reps 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, make_args, reps=8, warmup=2):
    for i in range(warmup):
        out = fn(*make_args(i))
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(reps):
        out = fn(*make_args(100 + i))
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--backbone", type=str, default="triplane")
    args = ap.parse_args()

    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance
    from dreamfusion_tpu.guidance.embeddings import prepare_text_embeddings
    from dreamfusion_tpu.training.trainer import Trainer

    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    # same text as bench.py so the fused-step HLO (embeddings are baked
    # literals) hits the same persistent-cache entry
    cfg = finalize(Config(
        text="a highly detailed hamburger", workspace="/tmp/dftpu_prof",
        backbone=args.backbone, w=args.hw, h=args.hw,
        latent_iter_ratio=0.0, fp16=True, seed=0,
        lambda_3d_normal_smooth=0.0))
    g = StableDiffusionGuidance(SDConfig(sd_version="2.1"))
    key = jax.random.PRNGKey(0)
    gp = g.init_params(key)
    gp = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x, gp)
    emb = prepare_text_embeddings(g, gp, cfg.text)
    emb = {k: v.astype(jnp.float32) for k, v in emb.items()}
    gp = jax.device_put(gp)

    tr = Trainer(cfg, guidances={"SD": g}, guidance_params={"SD": gp},
                 embeddings={"SD": emb})
    state = tr.init_state(key)

    H = W = args.hw
    results = {}

    # ---- 1. UNet CFG forward (batch 2, 64x64 latents, bf16) -------------
    @jax.jit
    def unet_fwd(gp, lat, t, ctx):
        x_in = jnp.concatenate([lat] * 2)
        t_in = jnp.concatenate([t] * 2)
        eps = g.unet.apply({"params": gp["unet"]}, x_in, t_in, ctx)
        return jnp.sum(eps.astype(jnp.float32))

    ctx = jnp.concatenate([emb["uncond"], emb["default"]])

    def unet_args(i):
        k = jax.random.PRNGKey(i)
        lat = jax.random.normal(k, (1, 64, 64, 4), jnp.bfloat16)
        t = jnp.full((1,), (i * 37) % 1000)
        return gp, lat, t, ctx

    results["unet_cfg_fwd"] = timeit(unet_fwd, unet_args, args.reps)

    # ---- 2. VAE encode fwd+bwd at 512^2 ----------------------------------
    @jax.jit
    def vae_encbwd(gp, img, k):
        def f(img):
            lat = g.encode_imgs(gp, k, img)
            return jnp.sum(lat.astype(jnp.float32) ** 2)
        return jax.grad(f)(img).astype(jnp.float32).sum()

    def vae_args(i):
        k = jax.random.PRNGKey(i)
        img = jax.random.uniform(k, (1, 512, 512, 3))
        return gp, img, k

    results["vae_enc_fwd_bwd"] = timeit(vae_encbwd, vae_args, args.reps)

    # ---- 3. bilinear resize 64->512 fwd+bwd ------------------------------
    @jax.jit
    def resize_bwd(img):
        def f(img):
            big = jax.image.resize(img, (1, 512, 512, 3), "bilinear")
            return jnp.sum(big ** 2)
        return jax.grad(f)(img).sum()

    results["resize_fwd_bwd"] = timeit(
        resize_bwd, lambda i: (jax.random.uniform(
            jax.random.PRNGKey(i), (1, H, W, 3)),), args.reps)

    # ---- 4. NeRF render fwd+bwd ------------------------------------------
    from dreamfusion_tpu.models.renderer import RenderFlags
    from dreamfusion_tpu.models.nerf import SHADING_IDS
    flags = RenderFlags(perturb=True, need_loss_orient=True,
                        need_normal_image=False)

    @jax.jit
    def render_bwd(params, occ, ro, rd, k):
        def f(params):
            out = tr.renderer.apply(
                {"params": params}, flags, ro, rd, occ_grid=occ,
                ambient_ratio=0.5, shading=SHADING_IDS["lambertian"],
                rngs={"render": k}, method=tr.renderer.render)
            return (jnp.sum(out["image"] ** 2) +
                    jnp.sum(out["weights_sum"]) + out.get(
                        "loss_orient", jnp.zeros(())))
        gr = jax.grad(f)(params)
        return jax.tree.reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), gr,
                               jnp.zeros(()))

    from dreamfusion_tpu.training.data import sample_train_batch

    def render_args(i):
        k = jax.random.PRNGKey(i)
        b = sample_train_batch(k, cfg, H, W, None, None, None, None)
        return (state.params, state.occ_grid, b.rays_o.reshape(-1, 3),
                b.rays_d.reshape(-1, 3), k)

    results["nerf_render_fwd_bwd"] = timeit(render_bwd, render_args,
                                            args.reps)

    # ---- 5. full fused step ----------------------------------------------
    step_fn = tr._make_train_step("main")
    st = {"s": state}

    def full(k):
        st["s"], m = step_fn(st["s"], k)
        return m["loss"]

    results["full_step"] = timeit(full, lambda i: (jax.random.PRNGKey(i),),
                                  args.reps)

    # ---- 6. density-grid update ------------------------------------------
    upd = tr._make_update_grid()

    def grid(k):
        s2 = upd(st["s"], k)
        return s2.mean_density

    results["update_grid"] = timeit(grid, lambda i: (jax.random.PRNGKey(i),),
                                    args.reps)

    accounted = (results["unet_cfg_fwd"] + results["vae_enc_fwd_bwd"] +
                 results["resize_fwd_bwd"] + results["nerf_render_fwd_bwd"])
    print("\n==== component timings (ms) ====")
    for k, v in results.items():
        print(f"{k:24s} {v * 1e3:9.1f}")
    print(f"{'sum(1-4)':24s} {accounted * 1e3:9.1f}  "
          f"(vs full_step {results['full_step'] * 1e3:.1f})")


if __name__ == "__main__":
    main()
