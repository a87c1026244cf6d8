"""Image preprocessing for image-conditioned (zero123) training.

TPU-side re-design of /root/reference/preprocess_image.py: produces
`X_rgba.png` (+ optional `X_depth.png`, `X_normal.png`) consumed by
training/image_data.load_ref_images (reference nerf/utils.py:375-402).

The reference stack (carvekit matting, omnidata DPT depth/normal,
BLIP2 captioning) needs pretrained downloads; this environment is
zero-egress, so each stage degrades gracefully:

  * background removal — carvekit/rembg if importable, otherwise a
    classical cv2 GrabCut matte seeded by the image border (no weights);
  * depth/normal — the VENDORED Flax DPT (models/dpt.py, the same
    vitb_rn50_384 architecture the reference vendors in dpt.py) fed by
    local omnidata checkpoints via `--omnidata_depth` / `--omnidata_normal`
    (torch .ckpt/.pt, converted on the fly, or pre-converted .npz);
  * fallbacks — a local `--dpt_path` transformers DPT checkpoint for
    depth, then finite-difference normals from the depth map, else skipped.

CLI:  python -m dreamfusion_tpu.preprocess_image image.png
      [--size 256] [--border_ratio 0.2] [--recenter 1]
      [--omnidata_depth d.ckpt] [--omnidata_normal n.ckpt]
      [--dpt_path /path]
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# background removal
# ---------------------------------------------------------------------------

class BackgroundRemoval:
    """carvekit → rembg → GrabCut, first available wins
    (reference preprocess_image.py:14-39)."""

    def __init__(self):
        self.backend = "grabcut"
        try:
            from carvekit.api.high import HiInterface  # noqa: F401
            self.backend = "carvekit"
        except Exception:
            try:
                import rembg  # noqa: F401
                self.backend = "rembg"
            except Exception:
                pass

    def __call__(self, rgb: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8 → [H, W, 4] uint8 rgba."""
        if self.backend == "carvekit":
            from PIL import Image

            from carvekit.api.high import HiInterface
            iface = HiInterface(object_type="object", batch_size_seg=1,
                                batch_size_matting=1)
            out = iface([Image.fromarray(rgb)])[0]
            return np.asarray(out.convert("RGBA"))
        if self.backend == "rembg":
            import rembg
            return np.asarray(rembg.remove(rgb))
        return self._grabcut(rgb)

    @staticmethod
    def _grabcut(rgb: np.ndarray, iters: int = 5) -> np.ndarray:
        import cv2
        h, w = rgb.shape[:2]
        mask = np.zeros((h, w), np.uint8)
        # seed: everything probable-foreground except a border band
        b = max(2, int(0.02 * min(h, w)))
        rect = (b, b, w - 2 * b, h - 2 * b)
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        cv2.grabCut(rgb, mask, rect, bgd, fgd, iters, cv2.GC_INIT_WITH_RECT)
        alpha = np.where((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD),
                         255, 0).astype(np.uint8)
        # clean speckles
        kernel = np.ones((3, 3), np.uint8)
        alpha = cv2.morphologyEx(alpha, cv2.MORPH_OPEN, kernel)
        alpha = cv2.morphologyEx(alpha, cv2.MORPH_CLOSE, kernel)
        return np.dstack([rgb, alpha])


# ---------------------------------------------------------------------------
# depth / normal
# ---------------------------------------------------------------------------

def run_omnidata(rgb: np.ndarray, ckpt: str, task: str = "depth",
                 cfg=None, hw: int = 384) -> np.ndarray:
    """Run the vendored Flax DPT (models/dpt.py) with omnidata weights.

    Mirrors the reference DPT wrapper (preprocess_image.py:95-115):
    384² input, depth normalized (x−0.5)/0.5 / normals raw [0,1], output
    clamped to [0,1] and resized back to the source resolution.
    `ckpt`: omnidata torch checkpoint (converted on the fly) or a
    pre-converted .npz from `utils/convert.py --kind dpt`."""
    import jax
    import jax.numpy as jnp

    from .models.dpt import DPTConfig, DPTDepthModel
    from .ops.resize import resize_bilinear

    if cfg is None:
        cfg = DPTConfig.normal() if task == "normal" else DPTConfig.depth()
    model = DPTDepthModel(cfg)
    if ckpt.endswith(".npz"):
        from .utils.params import load_params_npz
        params = load_params_npz(ckpt)
    else:
        from .utils.convert import convert_dpt
        template = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, hw, hw, 3))),
            jax.random.PRNGKey(0))
        params = convert_dpt(ckpt, template)

    x = rgb.astype(np.float32) / 255.0
    x = np.asarray(resize_bilinear(jnp.asarray(x)[None], (hw, hw)))
    if task == "depth":
        x = (x - 0.5) / 0.5
    out = jax.jit(model.apply)({"params": params["params"]},
                               jnp.asarray(x))
    out = jnp.clip(out, 0.0, 1.0)
    out = resize_bilinear(out, rgb.shape[:2])[0]
    return np.asarray(out[..., 0] if task == "depth" else out)


def estimate_depth(rgb: np.ndarray, dpt_path: Optional[str]
                   ) -> Optional[np.ndarray]:
    """[H, W, 3] uint8 → [H, W] float32 in [0,1], or None if no model."""
    if not dpt_path or not os.path.exists(dpt_path):
        return None
    import torch
    from transformers import DPTForDepthEstimation, DPTImageProcessor
    proc = DPTImageProcessor.from_pretrained(dpt_path)
    model = DPTForDepthEstimation.from_pretrained(dpt_path)
    model.eval()
    with torch.no_grad():
        inputs = proc(images=rgb, return_tensors="pt")
        depth = model(**inputs).predicted_depth[0].numpy()
    import cv2
    depth = cv2.resize(depth, (rgb.shape[1], rgb.shape[0]),
                       interpolation=cv2.INTER_LINEAR)
    lo, hi = depth.min(), depth.max()
    return ((depth - lo) / (hi - lo + 1e-9)).astype(np.float32)


def normal_from_depth(depth: np.ndarray, scale: float = 4.0) -> np.ndarray:
    """Finite-difference surface normals from a depth map → [H, W, 3] in
    [0,1] (omnidata-style encoding: n*0.5+0.5)."""
    dzdx = np.gradient(depth, axis=1) * scale * depth.shape[1]
    dzdy = np.gradient(depth, axis=0) * scale * depth.shape[0]
    n = np.dstack([-dzdx, -dzdy, np.ones_like(depth)])
    n = n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    return (n * 0.5 + 0.5).astype(np.float32)


# ---------------------------------------------------------------------------
# recenter / resize (reference preprocess_image.py:163-190)
# ---------------------------------------------------------------------------

def recenter(rgba: np.ndarray, size: int, border_ratio: float = 0.2
             ) -> np.ndarray:
    import cv2
    alpha = rgba[..., 3]
    ys, xs = np.nonzero(alpha > 10)
    if len(ys) == 0:
        return cv2.resize(rgba, (size, size), interpolation=cv2.INTER_AREA)
    y0, y1, x0, x1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    crop = rgba[y0:y1, x0:x1]
    h, w = crop.shape[:2]
    desired = int(size * (1 - border_ratio))
    scale = desired / max(h, w)
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    crop = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_AREA)
    out = np.zeros((size, size, 4), rgba.dtype)
    oy, ox = (size - nh) // 2, (size - nw) // 2
    out[oy:oy + nh, ox:ox + nw] = crop
    return out


# ---------------------------------------------------------------------------

class BLIP2Captioner:
    """Optional image→prompt captioner (reference preprocess_image.py:41-56
    — present there but disabled by default).  `model` is a LOCAL
    transformers BLIP-2 checkpoint directory (e.g. a pre-downloaded
    Salesforce/blip2-opt-2.7b); in this zero-egress environment no hub
    download is attempted, and a missing/bad checkpoint degrades to a
    clear error at construction rather than mid-pipeline."""

    def __init__(self, model: str):
        import torch
        from transformers import (AutoProcessor,
                                  Blip2ForConditionalGeneration)
        if not os.path.isdir(model):
            raise FileNotFoundError(
                f"BLIP-2 checkpoint dir not found: {model} (pass a local "
                "pre-downloaded Salesforce/blip2-* directory)")
        self._torch = torch
        self.processor = AutoProcessor.from_pretrained(model)
        self.model = Blip2ForConditionalGeneration.from_pretrained(
            model).eval()

    def __call__(self, image: np.ndarray) -> str:
        from PIL import Image
        torch = self._torch
        with torch.no_grad():
            inputs = self.processor(Image.fromarray(image),
                                    return_tensors="pt")
            ids = self.model.generate(**inputs, max_new_tokens=20)
        return self.processor.batch_decode(
            ids, skip_special_tokens=True)[0].strip()


def preprocess(path: str, size: int = 256, border_ratio: float = 0.2,
               dpt_path: Optional[str] = None, do_recenter: bool = True,
               omnidata_depth: Optional[str] = None,
               omnidata_normal: Optional[str] = None,
               caption_model: Optional[str] = None
               ) -> Tuple[str, Optional[str], Optional[str]]:
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"))
    rgba = BackgroundRemoval()(img)
    if do_recenter:
        rgba = recenter(rgba, size, border_ratio)

    base = os.path.splitext(path)[0]
    rgba_path = f"{base}_rgba.png"
    Image.fromarray(rgba).save(rgba_path)

    depth_path = normal_path = None
    mask = rgba[..., 3] > 10
    if omnidata_depth and os.path.exists(omnidata_depth):
        depth = run_omnidata(rgba[..., :3], omnidata_depth, "depth")
    else:
        depth = estimate_depth(rgba[..., :3], dpt_path)
    if depth is not None:
        depth = depth * mask
        depth_path = f"{base}_depth.png"
        Image.fromarray((depth * 255).astype(np.uint8)).save(depth_path)
    if omnidata_normal and os.path.exists(omnidata_normal):
        normal = run_omnidata(rgba[..., :3], omnidata_normal, "normal")
        normal = normal * mask[..., None]
    elif depth is not None:
        normal = normal_from_depth(depth)
    else:
        normal = None
    if normal is not None:
        normal_path = f"{base}_normal.png"
        Image.fromarray((normal * 255).astype(np.uint8)).save(normal_path)
    if caption_model:
        caption = BLIP2Captioner(caption_model)(img)
        cap_path = f"{base}_caption.txt"
        with open(cap_path, "w") as f:
            f.write(caption + "\n")
        print(f"[caption] {caption!r} -> {cap_path}")
    return rgba_path, depth_path, normal_path


def main(argv=None):
    ap = argparse.ArgumentParser("preprocess_image")
    ap.add_argument("path", type=str)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--border_ratio", type=float, default=0.2)
    ap.add_argument("--dpt_path", type=str, default=None,
                    help="local transformers DPT checkpoint dir (optional)")
    ap.add_argument("--omnidata_depth", type=str, default=None,
                    help="omnidata_dpt_depth_v2 .ckpt/.pt/.npz (optional)")
    ap.add_argument("--omnidata_normal", type=str, default=None,
                    help="omnidata_dpt_normal_v2 .ckpt/.pt/.npz (optional)")
    ap.add_argument("--recenter", type=int, default=1)
    ap.add_argument("--caption_model", type=str, default=None,
                    help="local BLIP-2 checkpoint dir → writes "
                         "*_caption.txt (reference's disabled BLIP2 hook, "
                         "preprocess_image.py:41-56)")
    args = ap.parse_args(argv)
    outs = preprocess(args.path, args.size, args.border_ratio,
                      args.dpt_path, bool(args.recenter),
                      args.omnidata_depth, args.omnidata_normal,
                      caption_model=args.caption_model)
    print("wrote:", *[o for o in outs if o])
    return outs


if __name__ == "__main__":
    main()
