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


def save_video(path: str, frames: List[np.ndarray], fps: int = 25) -> str:
    """mp4 via imageio (reference utils.py:880-885); falls back to per-frame
    pngs if no video backend is available.  Returns the written path (the
    first png's path under the fallback)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.stack([to_uint8(f) for f in frames])
    try:
        import imageio
        imageio.mimwrite(path, arr, fps=fps, quality=8,
                         macro_block_size=1)
        return path
    except Exception:
        base = os.path.splitext(path)[0]
        for i, f in enumerate(arr):
            save_image(f"{base}_{i:04d}.png", f / 255.0)
        return f"{base}_0000.png"


def colorize_depth(depth: np.ndarray) -> np.ndarray:
    d = np.asarray(depth)
    lo, hi = np.percentile(d[d > 0], 1) if (d > 0).any() else 0.0, d.max() + 1e-6
    d = np.clip((d - lo) / (hi - lo + 1e-6), 0, 1)
    return np.stack([d] * 3, axis=-1)
