"""Interactive orbit viewer (browser-based).

Replacement for the reference's DearPyGui desktop GUI (nerf/gui.py) —
DearPyGui needs a local display, which TPU pods don't have.  This serves a
self-contained HTML page (stdlib http.server, zero extra deps) with
mouse-drag orbit / wheel zoom, rendering frames on the accelerator through
the same jitted eval function the Trainer uses.  Mirrors the reference GUI's
behaviors: orbit camera (gui.py:10-66), shading-mode switch and dynamic
resolution (gui.py:137-169), and optional train-in-viewer stepping
(gui.py:103-125) when guidance is configured.

CLI:
  python -m dreamfusion_tpu.viewer --workspace ws [--port 7860]
      [--tiny_guidance]   # enable /train with tiny random guidance
"""

from __future__ import annotations

import argparse
import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>dreamfusion_tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:8px}
canvas{display:block;margin:auto;image-rendering:pixelated}
</style></head><body>
<div id="hud">drag: orbit &nbsp; wheel: zoom &nbsp;
<select id="shading"><option>albedo</option><option>lambertian</option>
<option>textureless</option><option>normal</option></select>
<select id="size"><option>128</option><option selected>256</option>
<option>512</option></select>
<button id="train" style="display:none">train 16 steps</button>
<span id="stat"></span></div>
<canvas id="c" width="512" height="512"></canvas>
<script>
let polar=90, azim=0, radius=__RADIUS__, busy=false, dirty=true;
const c=document.getElementById('c'), ctx=c.getContext('2d');
let drag=null;
c.onmousedown=e=>drag=[e.clientX,e.clientY];
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{if(!drag)return;
 azim-= (e.clientX-drag[0])*0.5; polar-=(e.clientY-drag[1])*0.5;
 polar=Math.max(1,Math.min(179,polar)); drag=[e.clientX,e.clientY]; dirty=true;};
c.onwheel=e=>{radius*=Math.exp(e.deltaY*0.001); dirty=true; e.preventDefault();};
document.getElementById('shading').onchange=()=>dirty=true;
document.getElementById('size').onchange=()=>dirty=true;
async function loop(){
 if(dirty&&!busy){busy=true;dirty=false;
  const s=document.getElementById('size').value;
  const sh=document.getElementById('shading').value;
  const t0=performance.now();
  const r=await fetch(`/render?polar=${polar}&azimuth=${azim}&radius=${radius}&size=${s}&shading=${sh}`);
  const b=await r.blob(); const img=await createImageBitmap(b);
  ctx.imageSmoothingEnabled=false; ctx.drawImage(img,0,0,c.width,c.height);
  document.getElementById('stat').textContent=` ${(performance.now()-t0)|0} ms`;
  busy=false;}
 requestAnimationFrame(loop);}
loop();
fetch('/caps').then(r=>r.json()).then(j=>{
 if(j.train){const b=document.getElementById('train');b.style.display='inline';
  b.onclick=async()=>{b.disabled=true;
   const r=await fetch('/train?steps=16');const j=await r.json();
   document.getElementById('stat').textContent=` step ${j.step} loss ${j.loss.toFixed(3)}`;
   b.disabled=false;dirty=true;};}});
</script></body></html>"""


class ViewerState:
    def __init__(self, trainer, state):
        self.trainer = trainer
        self.state = state
        self.lock = threading.Lock()
        self._eval_cache = {}

    def render(self, polar, azimuth, radius, size, shading="albedo"):
        import jax

        from .models.nerf import SHADING_IDS
        from .models.renderer import RenderFlags

        tr = self.trainer
        cfg = tr.cfg
        batch = _make_view(cfg, polar, azimuth, radius, size)
        if getattr(tr, "dmtet_renderer", None) is not None:
            with self.lock:
                img, _ = tr._render_view(self.state, batch, size, size)
            return np.clip(img, 0.0, 1.0)
        ro = batch.rays_o.reshape(-1, 3)
        rd = batch.rays_d.reshape(-1, 3)
        key = jax.random.PRNGKey(0)

        # fixed GUI light from --light_theta/--light_phi (polar/azimuth
        # degrees, y-up; theta is the polar angle — reference help:
        # [0,180] ~ elevation [90,-90] — nerf/utils.py:962-966)
        th, ph = np.deg2rad(cfg.light_theta), np.deg2rad(cfg.light_phi)
        light_d = np.array([np.sin(th) * np.sin(ph), np.cos(th),
                            np.sin(th) * np.cos(ph)], np.float32)

        sid = SHADING_IDS.get(shading, 0)
        fn = self._eval_cache.get((size, sid))
        if fn is None:
            renderer = tr.renderer

            @jax.jit
            def fn(params, occ, ro, rd, light_d):
                out = renderer.apply(
                    {"params": params}, RenderFlags(perturb=False), ro, rd,
                    occ_grid=occ if cfg.backbone in ("grid", "triplane")
                    else None,
                    light_d=light_d,
                    ambient_ratio=0.3 if shading == "lambertian" else 1.0,
                    shading=sid, rngs={"render": key},
                    method=renderer.render)
                return out["image"]

            self._eval_cache[(size, sid)] = fn
        with self.lock:
            img = fn(self.state.ema_params, self.state.occ_grid, ro, rd,
                     light_d)
        return np.asarray(img).reshape(size, size, 3)

    def train_steps(self, n):
        tr = self.trainer
        with self.lock:
            self.state = tr.train(self.state,
                                  max_steps=tr.global_step + n)
            loss = tr.stats["loss"][-1] if tr.stats["loss"] else float("nan")
            return {"step": tr.global_step, "loss": float(loss)}


def _make_view(cfg, polar, azimuth, radius, size):
    import jax.numpy as jnp
    import numpy as _np

    from .core.poses import circle_poses
    from .core.rays import (get_rays, intrinsics_from_fov, mvp_from_pose,
                            projection_matrix)

    poses, dirs = circle_poses(jnp.array([radius]), jnp.array([polar]),
                               jnp.array([azimuth % 360.0]))
    intr = intrinsics_from_fov(jnp.asarray(cfg.default_fovy), size, size)
    ro, rd = get_rays(poses, intr, size, size)
    focal = size / (2 * _np.tan(_np.radians(cfg.default_fovy) / 2))
    proj = projection_matrix(jnp.asarray(focal, jnp.float32), size, size,
                             cfg.min_near, 100.0)
    mvp_ = mvp_from_pose(poses, proj)

    class V:  # minimal batch
        rays_o = ro
        rays_d = rd
        mvp = mvp_
    return V


def make_handler(vs: ViewerState, can_train: bool):
    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype="text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            if u.path == "/":
                page = _PAGE.replace(
                    "__RADIUS__",
                    repr(float(vs.trainer.cfg.default_radius)))
                self._send(200, page.encode())
            elif u.path == "/caps":
                self._send(200, json.dumps({"train": can_train}).encode(),
                           "application/json")
            elif u.path == "/render":
                size = int(q.get("size", 256))
                img = vs.render(float(q.get("polar", 90)),
                                float(q.get("azimuth", 0)),
                                float(q.get("radius",
                                            vs.trainer.cfg.default_radius)),
                                size,
                                q.get("shading", "albedo"))
                from PIL import Image
                buf = io.BytesIO()
                Image.fromarray(
                    (np.clip(img, 0, 1) * 255).astype(np.uint8)
                ).save(buf, "PNG")
                self._send(200, buf.getvalue(), "image/png")
            elif u.path == "/train" and can_train:
                out = vs.train_steps(int(q.get("steps", 16)))
                self._send(200, json.dumps(out).encode(), "application/json")
            else:
                self._send(404, b"not found")

    return H


def main(argv=None):
    ap = argparse.ArgumentParser("viewer")
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--text", default=None,
                    help="enable train-in-viewer with this prompt")
    ap.add_argument("--tiny_guidance", action="store_true")
    ap.add_argument("--backbone", default=None)
    args = ap.parse_args(argv)

    from .utils.platform import honor_cpu_env
    honor_cpu_env()
    import jax

    from .config import Config, finalize
    from .main import build_guidance
    from .training.trainer import Trainer

    cfg_path = os.path.join(args.workspace, "config.json")
    if os.path.exists(cfg_path):
        from .config import load_config_json
        cfg = load_config_json(cfg_path)
    else:
        kw = dict(text=args.text or "a hamburger", workspace=args.workspace)
        if args.backbone:
            kw["backbone"] = args.backbone
        cfg = finalize(Config(**kw))

    can_train = args.text is not None
    guidances, gparams, embeddings = ({}, {}, {})
    if can_train:
        guidances, gparams, embeddings = build_guidance(
            cfg, tiny=args.tiny_guidance)
    if getattr(cfg, "dmtet", False):
        from .training.dmtet_trainer import DMTetTrainer
        trainer = DMTetTrainer(cfg, guidances=guidances,
                               guidance_params=gparams,
                               embeddings=embeddings)
    else:
        trainer = Trainer(cfg, guidances=guidances, guidance_params=gparams,
                          embeddings=embeddings)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed or 0))
    state, loaded = trainer.load_checkpoint(state, "latest")
    status = "loaded" if loaded else "NOT found - rendering random field"
    print(f"[viewer] checkpoint {status}; serving http://0.0.0.0:{args.port}",
          flush=True)
    vs = ViewerState(trainer, state)
    ThreadingHTTPServer(("0.0.0.0", args.port),
                        make_handler(vs, can_train)).serve_forever()


if __name__ == "__main__":
    main()
