"""CLIP R-precision evaluation.

Reference: /root/reference/evaluation/r_precision.py (cosine similarity of
validation renders vs the prompt through CLIP, the DreamFusion paper's
quality protocol).  The reference uses sentence-transformers CLIP ViT-B/16;
here the scoring runs through our own Flax CLIP (models/clip.py) under jit.

Zero-egress note: real scores need converted CLIP weights via
`--pretrained_root`; without them the pipeline still runs (random weights)
so it can be smoke-tested, but the numbers are meaningless.

CLI:
  python -m dreamfusion_tpu.evaluation.r_precision \
      --images workspace/validation --text "a hamburger" \
      [--distractors prompts.txt] [--pretrained_root /path/to/clip]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import List, Optional, Sequence

import numpy as np


def load_images(path: str, size: int = 224) -> np.ndarray:
    """Directory of pngs (or a single file) → [N, H, W, 3] float in [0,1]."""
    from PIL import Image
    files = sorted(glob.glob(os.path.join(path, "*.png"))) \
        if os.path.isdir(path) else [path]
    if not files:
        raise FileNotFoundError(f"no .png under {path}")
    out = []
    for f in files:
        im = Image.open(f).convert("RGB").resize((size, size),
                                                 Image.BILINEAR)
        out.append(np.asarray(im, np.float32) / 255.0)
    return np.stack(out)


def r_precision(images: np.ndarray, text: str,
                distractors: Sequence[str] = (),
                pretrained_root: Optional[str] = None,
                tiny: bool = False) -> dict:
    """Mean cosine similarity of each render to `text`, plus R-precision@1:
    the fraction of renders whose top-similarity prompt among
    [text] + distractors is `text` (evaluation/r_precision.py:19-29)."""
    import jax
    import jax.numpy as jnp

    from ..guidance.clip import CLIPConfig, CLIPGuidance
    from ..guidance.embeddings import load_tokenizer

    g = CLIPGuidance(CLIPConfig(tiny=tiny))
    params = g.init_params(jax.random.PRNGKey(0))
    if pretrained_root:
        from ..utils.params import maybe_load_params
        params = maybe_load_params(pretrained_root, "clip", params)
    tcfg = g.cfg.text_config()
    tok = load_tokenizer(pretrained_root, tcfg.vocab_size, tcfg.max_len)

    prompts = [text] + list(distractors)
    ids = np.concatenate([tok(p) for p in prompts])          # [P, L]
    tz = np.asarray(jax.jit(g.get_text_embeds)(params, jnp.asarray(ids)))
    tz = tz / np.linalg.norm(tz, axis=-1, keepdims=True)      # [P, D]

    iz = np.asarray(jax.jit(g.get_img_embeds)(
        params, jnp.asarray(images)))
    iz = iz / np.linalg.norm(iz, axis=-1, keepdims=True)      # [N, D]

    sims = iz @ tz.T                                          # [N, P]
    mean_sim = float(sims[:, 0].mean())
    rp = float((sims.argmax(axis=1) == 0).mean()) if len(prompts) > 1 \
        else 1.0
    return {"mean_clip_similarity": mean_sim,
            "r_precision": rp,
            "n_images": int(len(images)),
            "n_prompts": len(prompts)}


def main(argv=None):
    ap = argparse.ArgumentParser("r_precision")
    ap.add_argument("--images", required=True,
                    help="directory of rendered pngs (or one file)")
    ap.add_argument("--text", required=True)
    ap.add_argument("--distractors", type=str, default=None,
                    help="text file, one distractor prompt per line")
    ap.add_argument("--pretrained_root", type=str, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CLIP (smoke runs)")
    args = ap.parse_args(argv)

    distractors: List[str] = []
    if args.distractors:
        with open(args.distractors) as f:
            distractors = [l.strip() for l in f if l.strip()]

    images = load_images(args.images)
    out = r_precision(images, args.text, distractors,
                      pretrained_root=args.pretrained_root, tiny=args.tiny)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
