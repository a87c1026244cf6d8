"""Host-side image/video IO (reference nerf/utils.py:838-887 test writer)."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:  # already quantized on device
        return img
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = to_uint8(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    Image.fromarray(arr).save(path)


def load_image(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path)).astype(np.float32) / 255.0


def _save_video_cv2(path: str, arr: np.ndarray, fps: int) -> str:
    """OpenCV carries its own MPEG-4 encoder — no ffmpeg binary needed on
    this image (imageio's ffmpeg plugin is absent; cv2 'mp4v' verified to
    produce a readable .mp4)."""
    import cv2
    h, w = arr.shape[1:3]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
    if not writer.isOpened():
        raise RuntimeError(f"cv2.VideoWriter failed to open {path}")
    for f in arr:
        if f.ndim == 2:
            f = np.stack([f] * 3, axis=-1)
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()
    if not os.path.exists(path) or os.path.getsize(path) == 0:
        raise RuntimeError(f"cv2.VideoWriter wrote nothing to {path}")
    return path


def save_video(path: str, frames: List[np.ndarray], fps: int = 25) -> str:
    """mp4 (reference utils.py:880-885): imageio when its ffmpeg backend
    exists, else OpenCV's built-in mp4v encoder.  Only if both encoders are
    unavailable does it degrade to per-frame pngs — loudly, because that
    changes the deliverable's format.  Returns the written path (the first
    png's path under the fallback)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.stack([to_uint8(f) for f in frames])
    try:
        import imageio
        imageio.mimwrite(path, arr, fps=fps, quality=8,
                         macro_block_size=1)
        return path
    except Exception:
        pass
    try:
        return _save_video_cv2(path, arr, fps)
    except Exception as e:
        print(f"[save_video] WARNING: no video encoder available "
              f"({e!r}); degrading {os.path.basename(path)} to "
              f"{len(arr)} per-frame pngs", flush=True)
        base = os.path.splitext(path)[0]
        for i, f in enumerate(arr):
            save_image(f"{base}_{i:04d}.png", f / 255.0)
        return f"{base}_0000.png"


def colorize_depth(depth: np.ndarray) -> np.ndarray:
    d = np.asarray(depth)
    lo, hi = np.percentile(d[d > 0], 1) if (d > 0).any() else 0.0, d.max() + 1e-6
    d = np.clip((d - lo) / (hi - lo + 1e-6), 0, 1)
    return np.stack([d] * 3, axis=-1)
