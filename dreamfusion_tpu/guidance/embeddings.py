"""Text-embedding preparation (one-time, host-side).

Reference: Trainer.prepare_embeddings (/root/reference/nerf/utils.py:352-373)
— encodes the prompt plus per-direction variants ("..., front view" etc.)
with the frozen CLIP text encoder once, before training.

Zero-egress reality: pretrained tokenizer/weights may be absent.  Three
paths, in order of preference:
  1. `pretrained_root` has a converted checkpoint + tokenizer → real
     embeddings through the Flax CLIP text encoder.
  2. random guidance params (tests / smoke runs) → embeddings produced by
     the same encoder over a *hash tokenizer* (deterministic ids from the
     prompt text) — exercises the full pipeline shape-faithfully.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

DIRECTION_SUFFIXES = {
    "front": "front view",
    "side": "side view",
    "back": "back view",
}


class HashTokenizer:
    """Deterministic stand-in tokenizer: word → stable id.  Only used when
    no real tokenizer files are available; embeddings are then as random as
    the random-initialized text encoder anyway."""

    def __init__(self, vocab_size: int, max_len: int,
                 bos: int = 0, eos: int = 1):
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.bos, self.eos = bos, eos

    def __call__(self, text: str) -> np.ndarray:
        ids = [self.bos]
        for w in text.lower().split():
            h = int(hashlib.md5(w.encode()).hexdigest(), 16)
            ids.append(2 + h % (self.vocab_size - 2))
        ids = ids[: self.max_len - 1] + [self.eos]
        ids = ids + [self.eos] * (self.max_len - len(ids))
        return np.asarray([ids], dtype=np.int32)


def load_tokenizer(pretrained_root: Optional[str], vocab_size: int,
                   max_len: int):
    if pretrained_root:
        try:
            from transformers import CLIPTokenizer
            tok = CLIPTokenizer.from_pretrained(pretrained_root)

            def encode(text: str) -> np.ndarray:
                out = tok(text, padding="max_length", max_length=max_len,
                          truncation=True, return_tensors="np")
                return out["input_ids"].astype(np.int32)

            return encode
        except Exception:
            pass
    return HashTokenizer(vocab_size, max_len)


def prepare_text_embeddings(
    guidance, gparams, text: str, negative: str = "",
    pretrained_root: Optional[str] = None,
) -> Dict[str, jax.Array]:
    """→ dict with default/uncond/front/side/back, each [1, L, D]
    (mirrors nerf/utils.py:358-366)."""
    tcfg = guidance.text_encoder.cfg
    tok = load_tokenizer(pretrained_root, tcfg.vocab_size, tcfg.max_len)
    embed = jax.jit(guidance.get_text_embeds)

    # get_text_embeds touches only params["text"]; device_put THAT subtree
    # once and reuse it for all 5 prompts.  Passing the whole host-side
    # gparams tree re-uploaded the full ~4 GB f32 guidance tower per call
    # (5 calls ≈ 21 GB through the tunnel — measured ~190 s of startup).
    tp = {"text": jax.device_put(gparams["text"])}
    out = {
        "default": embed(tp, jnp.asarray(tok(text))),
        "uncond": embed(tp, jnp.asarray(tok(negative))),
    }
    for d, suffix in DIRECTION_SUFFIXES.items():
        out[d] = embed(tp, jnp.asarray(tok(f"{text}, {suffix}")))
    return out
