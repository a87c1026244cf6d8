"""DMTet refinement-stage trainer.

TPU-native re-design of the reference's second stage
(`--dmtet --init_with ckpt`, /root/reference/main.py:253-274,317-329;
train path nerf/renderer.py:862-964):

  * trainable (sdf, deform) on a tetrahedral grid + the NeRF MLP reused as
    a texture field (frozen with --lock_geo only the geometry freezes —
    reference network_grid.py:168-170 keeps MLP params trainable);
  * one jitted step: marching tets → tile rasterization → albedo query →
    lambertian shading → SDS + normal-consistency + Laplacian regularizers
    → Adan update → EMA;
  * stage bootstrap: load the stage-1 orbax checkpoint, scale the tet grid
    to the occupied region, init sdf = clamp(σ − thresh) (renderer.py:817-859).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..mesh.tets import (generate_tet_grid, load_cached_tet_grid,
                         load_tet_grid)
from ..models.dmtet import DMTetParams, DMTetRenderer
from . import schedules
from .data import circle_view_batch, sample_train_batch, six_view_batch
from .trainer import Trainer


@flax.struct.dataclass
class DMTetState:
    params: Any                  # {"nerf": ..., "geo": {"sdf", "deform"}}
    opt_state: Any
    ema_params: Any
    tet_scale: jax.Array         # [3], fixed after init (renderer.py:846)
    step: jax.Array


class DMTetTrainer(Trainer):
    def __init__(self, cfg: Config, tet_grid=None, max_tris: Optional[int] = None,
                 **kw):
        super().__init__(cfg, **kw)
        if tet_grid is None:
            tets_dir = os.path.abspath(os.path.join(
                os.path.dirname(__file__), os.pardir, os.pardir, "tets"))
            npz = os.path.join(tets_dir, f"{cfg.tet_grid_size}_tets.npz")
            if os.path.exists(npz):
                tet_grid = load_tet_grid(npz)
            else:
                # build once, cache the generated grid + topology to disk.
                # cubic n = size//2 matches quartet-`size` tet density
                # (see generate_tet_grid's docstring) — n = size would be
                # 8× denser than the reference's grids
                n = max(8, cfg.tet_grid_size // 2)
                cache = os.path.join(
                    os.path.expanduser("~/.cache/dftpu_tets"),
                    f"cube_{n}.npz")
                tet_grid = load_cached_tet_grid(cache, n)
        if max_tris is None:
            # surface ∝ size²; 8·size² ≈ 4× a typical converged surface
            # (the soak surface at size 128 was ~20k tris).  The budget is
            # the rasterizer's per-tile top_k length — over-provisioning
            # directly multiplies the stage's step time.
            max_tris = max(1 << 13, 8 * cfg.tet_grid_size ** 2)
        max_tris = min(max_tris, 2 * tet_grid.num_tets)
        self.dmtet_renderer = DMTetRenderer(tet_grid, max_tris=max_tris)
        self.needs_density_grid = False

    # ------------------------------------------------------------------
    def _nerf_density_fn(self, nerf_params, name: str):
        renderer = self.renderer

        def fn(x):
            return renderer.apply({"params": nerf_params}, x,
                                  method=renderer.density)[name]
        return fn

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array,
                   nerf_ckpt: Optional[str] = None) -> DMTetState:
        """Bootstrap from a stage-1 checkpoint (main.py:317-329) or, with no
        checkpoint, from a unit sphere SDF (for tests / cold starts)."""
        cfg = self.cfg
        init_with = nerf_ckpt or cfg.init_with
        is_mesh = bool(init_with) and init_with.lower().endswith(
            (".obj", ".ply"))
        nerf_params = self._load_nerf_params(
            "" if is_mesh else init_with, key)
        if is_mesh:
            # --init_with mesh.obj (reference main.py:320-329 → init_tet
            # from a trimesh + cubvh SDF, renderer.py:817-836); the
            # texture field starts from scratch, geometry from the mesh
            from ..mesh.sdf import load_mesh
            mv, mt = load_mesh(init_with)
            self.log(f"[dmtet] mesh init from {init_with}: "
                     f"{len(mv)} verts, {len(mt)} tris")
            geo = self.dmtet_renderer.init_params_from_mesh(mv, mt)
        elif init_with:
            geo = self.dmtet_renderer.init_params_from_density(
                jax.jit(self._nerf_density_fn(nerf_params, "sigma")),
                cfg.density_thresh)
        else:
            geo = self.dmtet_renderer.init_params_sphere(radius=0.5)
        params = {"nerf": nerf_params,
                  "geo": {"sdf": geo.sdf, "deform": geo.deform}}
        return DMTetState(
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=params,
            tet_scale=geo.tet_scale,
            step=jnp.zeros((), jnp.int32),
        )

    def _load_nerf_params(self, ckpt: str, key: jax.Array):
        from ..models.renderer import RenderFlags
        ro = jnp.zeros((64, 3))
        rd = jnp.ones((64, 3))
        occ = jnp.ones((self.cfg.cascade, self.cfg.grid_size,
                        self.cfg.grid_size, self.cfg.grid_size), bool)
        variables = self.renderer.init(
            {"params": key, "render": key}, RenderFlags(), ro, rd,
            occ_grid=occ if self.cfg.backbone in ("grid", "triplane") else None,
            method=self.renderer.render)
        params = variables["params"]
        if not ckpt:
            return params
        import orbax.checkpoint as ocp
        if os.path.isdir(ckpt) and not os.path.exists(
                os.path.join(ckpt, "_CHECKPOINT_METADATA")):
            # workspace/checkpoints dir → newest checkpoint inside
            import glob as _glob
            cands = sorted(d for d in _glob.glob(os.path.join(ckpt, "df_ep*"))
                           if os.path.isdir(d))
            if not cands:
                raise FileNotFoundError(f"no checkpoints under {ckpt}")
            ckpt = cands[-1]
        raw = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
        src = raw.get("ema_params", raw.get("params", raw))
        restored = flax.serialization.from_state_dict(params, src)
        self.log(f"[dmtet] loaded stage-1 field from {ckpt}")
        return restored

    # ------------------------------------------------------------------
    def _make_train_step(self, phase: str):
        cfg = self.cfg
        renderer = self.renderer
        dmr = self.dmtet_renderer
        optimizer = self.optimizer
        H, W = cfg.h, cfg.w

        def loss_fn(params, state: DMTetState, key: jax.Array, gparams,
                    embs):
            k_batch, k_choice, k_guide = jax.random.split(key, 3)
            step = state.step
            r_exp = schedules.iter_ratio(step, cfg.exp_start_iter or 0,
                                         cfg.exp_end_iter or cfg.iters)
            batch = sample_train_batch(k_batch, cfg, H, W)
            choices = schedules.sample_step_choices(cfg, k_choice, r_exp)

            geo = DMTetParams(sdf=params["geo"]["sdf"],
                              deform=params["geo"]["deform"],
                              tet_scale=state.tet_scale)
            albedo_fn = self._nerf_density_fn(params["nerf"], "albedo")

            def render_one(mvp, ro, rd):
                return dmr.render(
                    geo, albedo_fn, mvp, H, W, ro, rd,
                    ambient_ratio=choices.ambient_ratio,
                    shading="lambertian", bg_color=choices.bg_color,
                    need_regularizers=True)

            out = jax.vmap(render_one)(batch.mvp, batch.rays_o, batch.rays_d)
            pred_rgb = out["image"]                       # [B, H, W, 3]

            loss = self._guidance_loss(gparams, k_guide, pred_rgb, batch,
                                       as_latent=False, embeddings=embs,
                                       bg=choices.bg_color)
            metrics = {"loss_sds": loss}
            # mesh regularizers (utils.py:715-721)
            if cfg.lambda_mesh_normal > 0:
                loss = loss + cfg.lambda_mesh_normal * \
                    jnp.mean(out["normal_loss"])
            if cfg.lambda_mesh_laplacian > 0:
                loss = loss + cfg.lambda_mesh_laplacian * \
                    jnp.mean(out["lap_loss"])
            metrics["loss"] = loss
            return loss, metrics

        @jax.jit
        def train_step(state: DMTetState, key: jax.Array, gparams, embs):
            # per-step stream derived in-jit (see Trainer._make_train_step)
            key = jax.random.fold_in(key, state.step)
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state, key, gparams,
                                       embs)
            if cfg.lock_geo:
                grads = {**grads,
                         "geo": jax.tree.map(jnp.zeros_like, grads["geo"])}
            from .trainer import apply_updates_guarded
            new_state = apply_updates_guarded(optimizer, cfg, state, grads)
            if cfg.lock_geo:
                # Adan's proximal weight decay would still shrink (sdf,
                # deform) even with zero grads — pin them outright
                new_state = new_state.replace(
                    params={**new_state.params, "geo": state.params["geo"]},
                    ema_params={**new_state.ema_params,
                                "geo": state.ema_params["geo"]})
            metrics["grad_ok"] = jnp.isfinite(optax.global_norm(grads))
            return new_state, metrics

        gp_dev = self._guidance_params_on_device()
        emb_dev = self._embeddings_on_device()
        return lambda state, key: train_step(state, key, gp_dev, emb_dev)

    # ------------------------------------------------------------------
    def _make_known_view_step(self):
        """Image-conditioned DMTet: the known-view reconstruction step
        rendered through the rasterizer (reference utils.py:446-590 with
        run_dmtet; normals/depth come from the mesh so only rgb+mask losses
        apply here, matching the reference's dmtet branch)."""
        from .data import default_view_batch

        cfg = self.cfg
        dmr = self.dmtet_renderer
        optimizer = self.optimizer
        ref = self.ref_images
        assert ref is not None
        K = ref.rgb.shape[0]
        kv_batch = default_view_batch(cfg, ref.radii, ref.polars,
                                      ref.azimuths, cfg.h, cfg.w)
        Hs, Ws = ref.rgb.shape[1:3]
        gt_rgb = jnp.asarray(ref.rgb)
        gt_mask = jnp.asarray(ref.mask)

        def loss_fn(params, state: DMTetState, key: jax.Array):
            k_sel, k_bg = jax.random.split(key)
            sel = jax.random.randint(k_sel, (), 0, K)
            bg = jax.random.uniform(k_bg, (3,))
            geo = DMTetParams(sdf=params["geo"]["sdf"],
                              deform=params["geo"]["deform"],
                              tet_scale=state.tet_scale)
            out = dmr.render(
                geo, self._nerf_density_fn(params["nerf"], "albedo"),
                kv_batch.mvp[sel], Hs, Ws,
                kv_batch.rays_o[sel], kv_batch.rays_d[sel],
                ambient_ratio=1.0, shading="lambertian", bg_color=bg,
                need_regularizers=True)
            m = gt_mask[sel].astype(jnp.float32)
            gt = gt_rgb[sel] * m[..., None] + bg * (1 - m[..., None])
            loss = cfg.lambda_rgb * jnp.mean((out["image"] - gt) ** 2)
            loss = loss + cfg.lambda_mask * jnp.mean(
                (out["weights_sum"] - m) ** 2)
            loss = loss + cfg.lambda_mesh_normal * out["normal_loss"] + \
                cfg.lambda_mesh_laplacian * out["lap_loss"]
            return loss, {"loss": loss, "loss_sds": jnp.zeros(())}

        @jax.jit
        def known_view_step(state: DMTetState, key: jax.Array):
            key = jax.random.fold_in(key, state.step)
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state, key)
            if cfg.lock_geo:
                grads = {**grads,
                         "geo": jax.tree.map(jnp.zeros_like, grads["geo"])}
            from .trainer import apply_updates_guarded
            new_state = apply_updates_guarded(optimizer, cfg, state, grads)
            if cfg.lock_geo:
                # Adan's proximal weight decay would still shrink (sdf,
                # deform) even with zero grads — pin them outright
                new_state = new_state.replace(
                    params={**new_state.params, "geo": state.params["geo"]},
                    ema_params={**new_state.ema_params,
                                "geo": state.ema_params["geo"]})
            metrics["grad_ok"] = jnp.isfinite(optax.global_norm(grads))
            return new_state, metrics

        return known_view_step

    # ------------------------------------------------------------------
    def _make_eval_fn(self, H: int, W: int):
        dmr = self.dmtet_renderer

        @jax.jit
        def eval_fn(params, tet_scale, mvp, ro, rd):
            geo = DMTetParams(sdf=params["geo"]["sdf"],
                              deform=params["geo"]["deform"],
                              tet_scale=tet_scale)
            out = dmr.render(geo,
                             self._nerf_density_fn(params["nerf"], "albedo"),
                             mvp, H, W, ro, rd,
                             ambient_ratio=1.0, shading="albedo",
                             bg_color=1.0)
            return out["image"], out["depth"], out["weights_sum"]

        return eval_fn

    def _render_view(self, state: DMTetState, batch, H, W):
        # cache per resolution — the rasterizer bakes (H, W) into the jit
        cache = getattr(self, "_eval_fns", None)
        if cache is None:
            cache = self._eval_fns = {}
        fn = cache.get((H, W))
        if fn is None:
            fn = cache[(H, W)] = self._make_eval_fn(H, W)
        img, depth, _ = fn(
            state.ema_params, state.tet_scale, batch.mvp[0],
            batch.rays_o[0], batch.rays_d[0])
        return np.asarray(img), np.asarray(depth)

    def evaluate(self, state: DMTetState, n_views: Optional[int] = None):
        cfg = self.cfg
        H, W = cfg.H, cfg.W   # eval res (reference --H/--W, main.py:114-115)
        n_views = n_views or min(cfg.dataset_size_valid, 4)
        from ..utils.image import save_image
        for i in range(n_views):
            batch = circle_view_batch(cfg, i, n_views, H, W)
            img, _ = self._render_view(state, batch, H, W)
            save_image(os.path.join(
                self.workspace, "validation",
                f"df_ep{self.epoch:04d}_{i:04d}_rgb.png"), img)

    def test(self, state: DMTetState, n_frames: Optional[int] = None,
             write_video: bool = True, six_views: bool = False):
        cfg = self.cfg
        H, W = cfg.H, cfg.W
        from ..utils.image import colorize_depth, save_image, save_video
        frames, depths = [], []
        n = 6 if six_views else (n_frames or cfg.dataset_size_test)
        for i in range(n):
            batch = six_view_batch(cfg, i, H, W) if six_views else \
                circle_view_batch(cfg, i, n, H, W)
            img, depth = self._render_view(state, batch, H, W)
            frames.append(img)
            depths.append(depth)
        rd = os.path.join(self.workspace, "results")
        if write_video and not six_views:
            save_video(os.path.join(rd, "df_rgb.mp4"), frames)
            save_video(os.path.join(rd, "df_depth.mp4"),
                       [colorize_depth(d) for d in depths])
        else:
            for i, f in enumerate(frames):
                save_image(os.path.join(rd, f"df_{i:04d}_rgb.png"), f)
        return frames

    # ------------------------------------------------------------------
    def _snapshot_render(self, state: DMTetState):
        cfg = self.cfg
        batch = circle_view_batch(cfg, 0, 4, cfg.h, cfg.w)
        render, _ = self._render_view(state, batch, cfg.h, cfg.w)
        return render

    # ------------------------------------------------------------------
    def extract_dmtet_mesh(self, state: DMTetState
                           ) -> Tuple[np.ndarray, np.ndarray]:
        """Marching-tets surface of the (EMA) geometry, compacted on host
        (feeds mesh/export.py; reference renderer.py:376-379)."""
        p = state.ema_params["geo"]
        geo = DMTetParams(sdf=p["sdf"], deform=p["deform"],
                          tet_scale=state.tet_scale)
        mesh = jax.jit(self.dmtet_renderer.extract_mesh)(geo)
        verts = np.asarray(mesh.verts)
        faces = np.asarray(mesh.faces)
        mask = np.asarray(mesh.face_mask)
        faces = faces[mask]
        used = np.unique(faces)
        remap = np.full(len(verts), -1, np.int64)
        remap[used] = np.arange(len(used))
        return verts[used].astype(np.float32), \
            remap[faces].astype(np.int32)
