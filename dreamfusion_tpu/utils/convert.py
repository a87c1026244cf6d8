"""Pretrained-checkpoint → Flax parameter conversion.

The reference loads guidance weights through diffusers/transformers/ldm
(`StableDiffusionPipeline.from_pretrained`, guidance/sd_utils.py:34-49;
`load_model_from_config` for zero123, guidance/zero123_utils.py:24-37).
This module converts the published torch checkpoints into our Flax module
trees (models/unet.py, models/vae.py, models/clip.py) so real weights can
be dropped into the guidance zoo when available.

Supported source layouts:
  * **diffusers** directory layout: unet/ vae/ text_encoder/ with
    `diffusion_pytorch_model.*` / `model.*` weights;
  * **ldm / CompVis single .ckpt** (`model.diffusion_model.*`,
    `first_stage_model.*`) — also the zero123 checkpoint layout, incl.
    `cc_projection` and the OpenAI-CLIP image encoder
    (`cond_stage_model.model.visual.*`);
  * **transformers** CLIPTextModel / CLIPVisionModel state dicts.

Conversion rules (torch → flax):
  conv weight  [O,I,kh,kw] → kernel [kh,kw,I,O]
  linear weight [O,I]      → kernel [I,O]
  linear-as-1×1-conv and 1×1-conv-as-linear are bridged by shape;
  norm weight/bias         → scale/bias unchanged.

CLI:
  python -m dreamfusion_tpu.utils.convert --kind sd --src /path/to/sd \
      --out /weights/sd   # writes unet.npz vae.npz text.npz
"""

from __future__ import annotations

import argparse
import os
import re
from typing import Any, Callable, Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# state-dict IO
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """.safetensors / .ckpt / .pt / .bin → {key: np.ndarray} (fp32)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                arr = f.get_tensor(k)
                if arr.dtype == np.float16:
                    arr = arr.astype(np.float32)
                out[k] = arr
        return out
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in raw.items()}


def _flax_paths(tree, prefix=()):
    import jax
    for kp, leaf in jax.tree_util.tree_leaves_with_path(tree):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)
        yield path, leaf


def _fit(torch_arr: np.ndarray, flax_leaf, key: str,
         is_kernel: bool = True) -> np.ndarray:
    """Layout-bridge a torch tensor into the flax leaf's shape.
    `is_kernel`: the flax leaf is a Dense/Conv kernel (needs transposing
    even when square — shape comparison can't tell)."""
    t = np.asarray(torch_arr)
    want = tuple(flax_leaf.shape)
    if t.ndim == 4:                       # conv [O,I,kh,kw]
        t = t.transpose(2, 3, 1, 0)       # → [kh,kw,I,O]
        if t.shape != want and len(want) == 2:   # 1×1 conv → linear
            t = t.reshape(t.shape[2], t.shape[3])
    elif t.ndim == 2:
        if len(want) == 4:                # linear → 1×1 conv
            t = t.T.reshape(1, 1, t.shape[1], t.shape[0])
        elif is_kernel:                   # linear kernel [O,I] → [I,O]
            t = t.T
    if t.shape != want:
        raise ValueError(f"{key}: converted shape {t.shape} != flax {want}")
    return t


def _convert(template, mapper: Callable[[str], Optional[str]],
             sd: Dict[str, np.ndarray], strict: bool = True,
             consumed: Optional[set] = None):
    """Fill `template` by translating each flax path to a torch key."""
    import jax
    import jax.numpy as jnp

    missing = []
    out = {}
    for path, leaf in _flax_paths(template):
        tk = mapper(path)
        if tk is None or tk not in sd:
            missing.append((path, tk))
            continue
        out[path] = jnp.asarray(
            _fit(sd[tk], leaf, tk, is_kernel=path.endswith("kernel")))
        if consumed is not None:
            consumed.add(tk)
    if strict and missing:
        raise KeyError(f"{len(missing)} unmapped params, e.g. {missing[:5]}")

    def fill(kp, leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)
        return out.get(path, leaf)

    return jax.tree_util.tree_map_with_path(fill, template), missing


# ---------------------------------------------------------------------------
# UNet key mapping
# ---------------------------------------------------------------------------

_RES_SUB_DIFFUSERS = {
    "GroupNorm32_0/GroupNorm_0/scale": "norm1.weight",
    "GroupNorm32_0/GroupNorm_0/bias": "norm1.bias",
    "conv1/kernel": "conv1.weight", "conv1/bias": "conv1.bias",
    "time_emb_proj/kernel": "time_emb_proj.weight",
    "time_emb_proj/bias": "time_emb_proj.bias",
    "GroupNorm32_1/GroupNorm_0/scale": "norm2.weight",
    "GroupNorm32_1/GroupNorm_0/bias": "norm2.bias",
    "conv2/kernel": "conv2.weight", "conv2/bias": "conv2.bias",
    "shortcut/kernel": "conv_shortcut.weight",
    "shortcut/bias": "conv_shortcut.bias",
}
_RES_SUB_LDM = {
    "GroupNorm32_0/GroupNorm_0/scale": "in_layers.0.weight",
    "GroupNorm32_0/GroupNorm_0/bias": "in_layers.0.bias",
    "conv1/kernel": "in_layers.2.weight", "conv1/bias": "in_layers.2.bias",
    "time_emb_proj/kernel": "emb_layers.1.weight",
    "time_emb_proj/bias": "emb_layers.1.bias",
    "GroupNorm32_1/GroupNorm_0/scale": "out_layers.0.weight",
    "GroupNorm32_1/GroupNorm_0/bias": "out_layers.0.bias",
    "conv2/kernel": "out_layers.3.weight", "conv2/bias": "out_layers.3.bias",
    "shortcut/kernel": "skip_connection.weight",
    "shortcut/bias": "skip_connection.bias",
}


def _attn_sub(rest: str, norm_name: str) -> str:
    """SpatialTransformer inner path → torch suffix (same for both layouts
    except the outer norm's name)."""
    m = {
        "GroupNorm32_0/GroupNorm_0/scale": f"{norm_name}.weight",
        "GroupNorm32_0/GroupNorm_0/bias": f"{norm_name}.bias",
        "proj_in/kernel": "proj_in.weight", "proj_in/bias": "proj_in.bias",
        "proj_out/kernel": "proj_out.weight",
        "proj_out/bias": "proj_out.bias",
    }
    if rest in m:
        return m[rest]
    b = re.match(r"block_(\d+)/(.*)", rest)
    assert b, rest
    k, inner = int(b.group(1)), b.group(2)
    inner_map = {
        "ff_geglu/proj/kernel": "ff.net.0.proj.weight",
        "ff_geglu/proj/bias": "ff.net.0.proj.bias",
        "ff_out/kernel": "ff.net.2.weight", "ff_out/bias": "ff.net.2.bias",
        "norm1/scale": "norm1.weight", "norm1/bias": "norm1.bias",
        "norm2/scale": "norm2.weight", "norm2/bias": "norm2.bias",
        "norm3/scale": "norm3.weight", "norm3/bias": "norm3.bias",
    }
    if inner in inner_map:
        return f"transformer_blocks.{k}.{inner_map[inner]}"
    a = re.match(r"attn(\d)/to_(q|k|v|out)/(kernel|bias)", inner)
    assert a, inner
    which, wb = a.group(2), "weight" if a.group(3) == "kernel" else "bias"
    tail = "to_out.0" if which == "out" else f"to_{which}"
    return f"transformer_blocks.{k}.attn{a.group(1)}.{tail}.{wb}"


def unet_mapper_diffusers(cfg) -> Callable[[str], Optional[str]]:
    L = len(cfg.channel_mult)

    def mapper(path: str) -> Optional[str]:
        p = path
        if p.startswith("time_dense_0/"):
            return "time_embedding.linear_1." + \
                ("weight" if p.endswith("kernel") else "bias")
        if p.startswith("time_dense_1/"):
            return "time_embedding.linear_2." + \
                ("weight" if p.endswith("kernel") else "bias")
        if p.startswith("conv_in/"):
            return "conv_in." + ("weight" if p.endswith("kernel") else "bias")
        if p.startswith("conv_out/"):
            return "conv_out." + ("weight" if p.endswith("kernel") else "bias")
        if p.startswith("GroupNorm32_0/"):
            return "conv_norm_out." + \
                ("weight" if p.endswith("scale") else "bias")
        m = re.match(r"(down|up)_(\d+)_res_(\d+)/(.*)", p)
        if m:
            d, lvl, blk, rest = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
            i = lvl if d == "down" else L - 1 - lvl
            return f"{d}_blocks.{i}.resnets.{blk}." + _RES_SUB_DIFFUSERS[rest]
        m = re.match(r"(down|up)_(\d+)_attn_(\d+)/(.*)", p)
        if m:
            d, lvl, blk, rest = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
            i = lvl if d == "down" else L - 1 - lvl
            return f"{d}_blocks.{i}.attentions.{blk}." + _attn_sub(rest, "norm")
        m = re.match(r"down_(\d+)_downsample/(kernel|bias)", p)
        if m:
            return f"down_blocks.{m.group(1)}.downsamplers.0.conv." + \
                ("weight" if m.group(2) == "kernel" else "bias")
        m = re.match(r"up_(\d+)_upsample/(kernel|bias)", p)
        if m:
            i = L - 1 - int(m.group(1))
            return f"up_blocks.{i}.upsamplers.0.conv." + \
                ("weight" if m.group(2) == "kernel" else "bias")
        m = re.match(r"mid_res_(\d)/(.*)", p)
        if m:
            return f"mid_block.resnets.{m.group(1)}." + \
                _RES_SUB_DIFFUSERS[m.group(2)]
        m = re.match(r"mid_attn/(.*)", p)
        if m:
            return "mid_block.attentions.0." + _attn_sub(m.group(1), "norm")
        return None

    return mapper


def unet_mapper_ldm(cfg, prefix: str = "model.diffusion_model."
                    ) -> Callable[[str], Optional[str]]:
    """openai/ldm UNetModel layout (zero123, CompVis SD ckpts)."""
    L = len(cfg.channel_mult)
    R = cfg.num_res_blocks
    # input_blocks index tables
    in_res: Dict[tuple, int] = {}
    in_down: Dict[int, int] = {}
    n = 1
    for lvl in range(L):
        for blk in range(R):
            in_res[(lvl, blk)] = n
            n += 1
        if lvl != L - 1:
            in_down[lvl] = n
            n += 1
    out_res: Dict[tuple, int] = {}
    out_up: Dict[int, tuple] = {}
    n = 0
    for lvl in reversed(range(L)):
        for blk in range(R + 1):
            out_res[(lvl, blk)] = n
            if lvl != 0 and blk == R:
                # upsample appended after res (and attn, if any)
                out_up[lvl] = (n, 2 if cfg.attn_levels[lvl] else 1)
            n += 1

    def mapper(path: str) -> Optional[str]:
        p = path
        wb = "weight" if p.endswith("kernel") or p.endswith("scale") else "bias"
        if p.startswith("time_dense_0/"):
            return f"{prefix}time_embed.0.{wb}"
        if p.startswith("time_dense_1/"):
            return f"{prefix}time_embed.2.{wb}"
        if p.startswith("conv_in/"):
            return f"{prefix}input_blocks.0.0.{wb}"
        if p.startswith("conv_out/"):
            return f"{prefix}out.2.{wb}"
        if p.startswith("GroupNorm32_0/"):
            return f"{prefix}out.0.{wb}"
        m = re.match(r"down_(\d+)_res_(\d+)/(.*)", p)
        if m:
            i = in_res[(int(m.group(1)), int(m.group(2)))]
            return f"{prefix}input_blocks.{i}.0." + _RES_SUB_LDM[m.group(3)]
        m = re.match(r"down_(\d+)_attn_(\d+)/(.*)", p)
        if m:
            i = in_res[(int(m.group(1)), int(m.group(2)))]
            return f"{prefix}input_blocks.{i}.1." + _attn_sub(m.group(3), "norm")
        m = re.match(r"down_(\d+)_downsample/", p)
        if m:
            i = in_down[int(m.group(1))]
            return f"{prefix}input_blocks.{i}.0.op.{wb}"
        m = re.match(r"mid_res_(\d)/(.*)", p)
        if m:
            i = 0 if m.group(1) == "0" else 2
            return f"{prefix}middle_block.{i}." + _RES_SUB_LDM[m.group(2)]
        m = re.match(r"mid_attn/(.*)", p)
        if m:
            return f"{prefix}middle_block.1." + _attn_sub(m.group(1), "norm")
        m = re.match(r"up_(\d+)_res_(\d+)/(.*)", p)
        if m:
            i = out_res[(int(m.group(1)), int(m.group(2)))]
            return f"{prefix}output_blocks.{i}.0." + _RES_SUB_LDM[m.group(3)]
        m = re.match(r"up_(\d+)_attn_(\d+)/(.*)", p)
        if m:
            i = out_res[(int(m.group(1)), int(m.group(2)))]
            return f"{prefix}output_blocks.{i}.1." + _attn_sub(m.group(3), "norm")
        m = re.match(r"up_(\d+)_upsample/", p)
        if m:
            i, sub = out_up[int(m.group(1))]
            return f"{prefix}output_blocks.{i}.{sub}.conv.{wb}"
        return None

    return mapper


# ---------------------------------------------------------------------------
# ldm ↔ diffusers key-rename bridge
#
# The correspondence between the CompVis/ldm single-ckpt layout and the
# diffusers per-module layout is a DETERMINISTIC rename, publicly documented
# by diffusers' convert_original_stable_diffusion_to_diffusers script
# (reference anchor: guidance/sd_utils.py:34-49 loads the diffusers layout;
# zero123_utils.py:24-37 loads the ldm layout of the same architecture).
# Encoding it once lets the diffusers-layout mappers above be validated
# against the GROUND-TRUTH ldm key inventories (tests/fixtures/
# sd15_ldm_keys.json) *through* the rename — breaking the circularity of
# checking a mapper against a fixture generated by itself.
# ---------------------------------------------------------------------------

_LDM2DIFF_RES = {
    "in_layers.0": "norm1", "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2", "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}

_LDM2DIFF_VAE_ATTN = {
    "norm": "group_norm", "q": "to_q", "k": "to_k", "v": "to_v",
    "proj_out": "to_out.0",
}


def _res_rename(rest: str) -> Optional[str]:
    """'in_layers.0.weight' → 'norm1.weight' (ldm ResBlock → diffusers)."""
    name, _, wb = rest.rpartition(".")
    new = _LDM2DIFF_RES.get(name)
    return None if new is None else f"{new}.{wb}"


def ldm_to_diffusers_unet_key(cfg, prefix: str = "model.diffusion_model."
                              ) -> Callable[[str], Optional[str]]:
    """ldm UNetModel checkpoint key → diffusers UNet2DConditionModel key.

    Structure walk mirrors unet_mapper_ldm's index tables: input_blocks
    hold R resnets per level then a downsample (except the last level);
    output_blocks hold R+1 entries per level, deepest first, with the
    upsampler appended to the level's last entry."""
    L = len(cfg.channel_mult)
    R = cfg.num_res_blocks

    # input_blocks index → (level, block | 'down')
    in_tab: Dict[int, tuple] = {}
    n = 1
    for lvl in range(L):
        for blk in range(R):
            in_tab[n] = (lvl, blk)
            n += 1
        if lvl != L - 1:
            in_tab[n] = (lvl, "down")
            n += 1

    def mapper(key: str) -> Optional[str]:
        if not key.startswith(prefix):
            return None
        p = key[len(prefix):]
        wb = p.rsplit(".", 1)[-1]
        if p.startswith("time_embed.0."):
            return f"time_embedding.linear_1.{wb}"
        if p.startswith("time_embed.2."):
            return f"time_embedding.linear_2.{wb}"
        if p.startswith("input_blocks.0.0."):
            return f"conv_in.{wb}"
        if p.startswith("out.0."):
            return f"conv_norm_out.{wb}"
        if p.startswith("out.2."):
            return f"conv_out.{wb}"
        m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.*)", p)
        if m:
            i, sub, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            lvl, blk = in_tab[i]
            if blk == "down":
                if sub != 0 or not rest.startswith("op."):
                    return None
                return f"down_blocks.{lvl}.downsamplers.0.conv.{wb}"
            if sub == 0:
                r = _res_rename(rest)
                return None if r is None else \
                    f"down_blocks.{lvl}.resnets.{blk}.{r}"
            if sub == 1:
                # SpatialTransformer sub-keys are named identically in
                # diffusers' Transformer2DModel
                return f"down_blocks.{lvl}.attentions.{blk}.{rest}"
            return None
        m = re.match(r"middle_block\.(\d)\.(.*)", p)
        if m:
            sub, rest = int(m.group(1)), m.group(2)
            if sub == 1:
                return f"mid_block.attentions.0.{rest}"
            r = _res_rename(rest)
            return None if r is None else \
                f"mid_block.resnets.{0 if sub == 0 else 1}.{r}"
        m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.*)", p)
        if m:
            i, sub, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            j, blk = i // (R + 1), i % (R + 1)
            if sub == 0:
                r = _res_rename(rest)
                return None if r is None else \
                    f"up_blocks.{j}.resnets.{blk}.{r}"
            if rest.startswith("conv."):  # upsampler (sub 1 or 2)
                return f"up_blocks.{j}.upsamplers.0.conv.{wb}"
            if sub == 1:
                return f"up_blocks.{j}.attentions.{blk}.{rest}"
            return None
        return None

    return mapper


def ldm_to_diffusers_vae_key(cfg, prefix: str = "first_stage_model."
                             ) -> Callable[[str], Optional[str]]:
    """ldm AutoencoderKL checkpoint key → diffusers AutoencoderKL key.

    Note the mid-block attention: ldm stores q/k/v/proj_out as 1×1 convs
    ([C, C, 1, 1]); diffusers stores them as linears ([C, C]) under
    to_q/to_k/to_v/to_out.0 — the rename implies that squeeze (handled by
    _fit's conv→dense path when converting actual tensors)."""
    L = len(cfg.ch_mult)

    def mapper(key: str) -> Optional[str]:
        if not key.startswith(prefix):
            return None
        p = key[len(prefix):]
        wb = p.rsplit(".", 1)[-1]
        if p.startswith(("quant_conv.", "post_quant_conv.")):
            return p
        side, _, p = p.partition(".")
        if side not in ("encoder", "decoder"):
            return None
        if p.startswith("norm_out."):
            return f"{side}.conv_norm_out.{wb}"
        if p.startswith(("conv_in.", "conv_out.")):
            return f"{side}.{p}"
        m = re.match(r"mid\.block_([12])\.(.*)", p)
        if m:
            rest = m.group(2)
            name, _, _ = rest.rpartition(".")
            if name == "nin_shortcut":
                rest = f"conv_shortcut.{wb}"
            return f"{side}.mid_block.resnets.{int(m.group(1)) - 1}.{rest}"
        m = re.match(r"mid\.attn_1\.(\w+)\.(weight|bias)", p)
        if m:
            new = _LDM2DIFF_VAE_ATTN.get(m.group(1))
            return None if new is None else \
                f"{side}.mid_block.attentions.0.{new}.{m.group(2)}"
        m = re.match(r"down\.(\d+)\.block\.(\d+)\.(.*)", p)
        if m:
            rest = m.group(3)
            if rest.startswith("nin_shortcut."):
                rest = f"conv_shortcut.{wb}"
            return f"encoder.down_blocks.{m.group(1)}.resnets." \
                   f"{m.group(2)}.{rest}"
        m = re.match(r"down\.(\d+)\.downsample\.conv\.", p)
        if m:
            return f"encoder.down_blocks.{m.group(1)}.downsamplers.0." \
                   f"conv.{wb}"
        m = re.match(r"up\.(\d+)\.block\.(\d+)\.(.*)", p)
        if m:
            rest = m.group(3)
            if rest.startswith("nin_shortcut."):
                rest = f"conv_shortcut.{wb}"
            return f"decoder.up_blocks.{L - 1 - int(m.group(1))}.resnets." \
                   f"{m.group(2)}.{rest}"
        m = re.match(r"up\.(\d+)\.upsample\.conv\.", p)
        if m:
            return f"decoder.up_blocks.{L - 1 - int(m.group(1))}." \
                   f"upsamplers.0.conv.{wb}"
        return None

    return mapper


# ---------------------------------------------------------------------------
# DeepFloyd-IF UNet key mapping (diffusers layout — the only published one)
# ---------------------------------------------------------------------------

_IF_RES_SUB = {
    "norm1/gn/scale": "norm1.weight", "norm1/gn/bias": "norm1.bias",
    "conv1/kernel": "conv1.weight", "conv1/bias": "conv1.bias",
    "time_emb_proj/kernel": "time_emb_proj.weight",
    "time_emb_proj/bias": "time_emb_proj.bias",
    "norm2/gn/scale": "norm2.weight", "norm2/gn/bias": "norm2.bias",
    "conv2/kernel": "conv2.weight", "conv2/bias": "conv2.bias",
    "conv_shortcut/kernel": "conv_shortcut.weight",
    "conv_shortcut/bias": "conv_shortcut.bias",
}

_IF_ATTN_SUB = {
    "group_norm/gn/scale": "group_norm.weight",
    "group_norm/gn/bias": "group_norm.bias",
    "norm_cross/gn/scale": "norm_cross.weight",
    "norm_cross/gn/bias": "norm_cross.bias",
    "to_q/kernel": "to_q.weight", "to_q/bias": "to_q.bias",
    "to_k/kernel": "to_k.weight", "to_k/bias": "to_k.bias",
    "to_v/kernel": "to_v.weight", "to_v/bias": "to_v.bias",
    "add_k_proj/kernel": "add_k_proj.weight",
    "add_k_proj/bias": "add_k_proj.bias",
    "add_v_proj/kernel": "add_v_proj.weight",
    "add_v_proj/bias": "add_v_proj.bias",
    "to_out/kernel": "to_out.0.weight", "to_out/bias": "to_out.0.bias",
}


def if_unet_mapper(cfg) -> Callable[[str], Optional[str]]:
    """models/if_unet.IFUNet → diffusers UNet2DConditionModel (IF variant)
    key layout (SimpleCrossAttn blocks, resnet down/upsamplers,
    TextTimeEmbedding, encoder_hid_proj)."""
    L = len(cfg.block_out_channels)

    def mapper(path: str) -> Optional[str]:
        p = path
        wb = "weight" if p.endswith(("kernel", "scale")) else "bias"
        if p.startswith("time_dense_0/"):
            return f"time_embedding.linear_1.{wb}"
        if p.startswith("time_dense_1/"):
            return f"time_embedding.linear_2.{wb}"
        if p.startswith("encoder_hid_proj/"):
            return f"encoder_hid_proj.{wb}"
        if p.startswith("add_embedding/"):
            rest = p[len("add_embedding/"):]
            if rest == "pool/positional_embedding":
                return "add_embedding.pool.positional_embedding"
            m = re.match(r"pool/(q_proj|k_proj|v_proj)/", rest)
            if m:
                return f"add_embedding.pool.{m.group(1)}.{wb}"
            for name in ("norm1", "norm2", "proj"):
                if rest.startswith(name + "/"):
                    return f"add_embedding.{name}.{wb}"
            return None
        if p.startswith("conv_in/"):
            return f"conv_in.{wb}"
        if p.startswith("conv_out/"):
            return f"conv_out.{wb}"
        if p.startswith("norm_out/"):
            return f"conv_norm_out.{wb}"
        m = re.match(r"(down|up)_(\d+)_res_(\d+)/(.*)", p)
        if m:
            d, lvl, blk, rest = m.group(1), int(m.group(2)), \
                int(m.group(3)), m.group(4)
            i = lvl if d == "down" else L - 1 - lvl
            return f"{d}_blocks.{i}.resnets.{blk}." + _IF_RES_SUB[rest]
        m = re.match(r"(down|up)_(\d+)_attn_(\d+)/(.*)", p)
        if m:
            d, lvl, blk, rest = m.group(1), int(m.group(2)), \
                int(m.group(3)), m.group(4)
            i = lvl if d == "down" else L - 1 - lvl
            return f"{d}_blocks.{i}.attentions.{blk}." + _IF_ATTN_SUB[rest]
        m = re.match(r"down_(\d+)_down/(.*)", p)
        if m:
            return f"down_blocks.{m.group(1)}.downsamplers.0." + \
                _IF_RES_SUB[m.group(2)]
        m = re.match(r"up_(\d+)_up/(.*)", p)
        if m:
            i = L - 1 - int(m.group(1))
            return f"up_blocks.{i}.upsamplers.0." + _IF_RES_SUB[m.group(2)]
        m = re.match(r"mid_res_(\d)/(.*)", p)
        if m:
            return f"mid_block.resnets.{m.group(1)}." + \
                _IF_RES_SUB[m.group(2)]
        m = re.match(r"mid_attn/(.*)", p)
        if m:
            return "mid_block.attentions.0." + _IF_ATTN_SUB[m.group(1)]
        return None

    return mapper


# ---------------------------------------------------------------------------
# T5 encoder key mapping (transformers T5EncoderModel)
# ---------------------------------------------------------------------------

def t5_mapper() -> Callable[[str], Optional[str]]:
    """models/t5.T5Encoder → transformers T5EncoderModel state-dict keys
    (verified against the recorded t5-v1_1 key inventory fixture)."""

    def mapper(path: str) -> Optional[str]:
        p = path
        if p == "shared/embedding":
            return "shared.weight"
        if p == "final_ln/weight":
            return "encoder.final_layer_norm.weight"
        m = re.match(r"block_(\d+)/(.*)", p)
        if not m:
            return None
        i, rest = m.group(1), m.group(2)
        pre = f"encoder.block.{i}."
        if rest == "attn/relative_attention_bias":
            return pre + "layer.0.SelfAttention.relative_attention_bias.weight"
        a = re.match(r"attn/(q|k|v|o)/kernel", rest)
        if a:
            return pre + f"layer.0.SelfAttention.{a.group(1)}.weight"
        if rest == "ln_attn/weight":
            return pre + "layer.0.layer_norm.weight"
        f = re.match(r"(wi_0|wi_1|wo)/kernel", rest)
        if f:
            return pre + f"layer.1.DenseReluDense.{f.group(1)}.weight"
        if rest == "ln_ff/weight":
            return pre + "layer.1.layer_norm.weight"
        return None

    return mapper


# ---------------------------------------------------------------------------
# VAE key mapping
# ---------------------------------------------------------------------------

_VAE_RES_DIFFUSERS = {
    "GroupNorm32_0/GroupNorm_0/scale": "norm1.weight",
    "GroupNorm32_0/GroupNorm_0/bias": "norm1.bias",
    "conv1/kernel": "conv1.weight", "conv1/bias": "conv1.bias",
    "GroupNorm32_1/GroupNorm_0/scale": "norm2.weight",
    "GroupNorm32_1/GroupNorm_0/bias": "norm2.bias",
    "conv2/kernel": "conv2.weight", "conv2/bias": "conv2.bias",
    "shortcut/kernel": "conv_shortcut.weight",
    "shortcut/bias": "conv_shortcut.bias",
}
_VAE_RES_LDM = dict(_VAE_RES_DIFFUSERS,
                    **{"shortcut/kernel": "nin_shortcut.weight",
                       "shortcut/bias": "nin_shortcut.bias"})
_VAE_ATTN_DIFFUSERS = {
    "GroupNorm32_0/GroupNorm_0/scale": "group_norm.weight",
    "GroupNorm32_0/GroupNorm_0/bias": "group_norm.bias",
    "q/kernel": "to_q.weight", "q/bias": "to_q.bias",
    "k/kernel": "to_k.weight", "k/bias": "to_k.bias",
    "v/kernel": "to_v.weight", "v/bias": "to_v.bias",
    "proj_out/kernel": "to_out.0.weight", "proj_out/bias": "to_out.0.bias",
}
_VAE_ATTN_LDM = {
    "GroupNorm32_0/GroupNorm_0/scale": "norm.weight",
    "GroupNorm32_0/GroupNorm_0/bias": "norm.bias",
    "q/kernel": "q.weight", "q/bias": "q.bias",
    "k/kernel": "k.weight", "k/bias": "k.bias",
    "v/kernel": "v.weight", "v/bias": "v.bias",
    "proj_out/kernel": "proj_out.weight", "proj_out/bias": "proj_out.bias",
}


def vae_mapper(cfg, layout: str = "diffusers", prefix: str = ""
               ) -> Callable[[str], Optional[str]]:
    """layout: 'diffusers' or 'ldm' (prefix e.g. 'first_stage_model.')."""
    L = len(cfg.ch_mult)
    res_map = _VAE_RES_DIFFUSERS if layout == "diffusers" else _VAE_RES_LDM
    attn_map = _VAE_ATTN_DIFFUSERS if layout == "diffusers" else _VAE_ATTN_LDM

    def mapper(path: str) -> Optional[str]:
        side, _, p = path.partition("/")
        assert side in ("encoder", "decoder"), path
        wb = "weight" if p.endswith("kernel") or p.endswith("scale") else "bias"
        pre = f"{prefix}{side}."
        if p.startswith("quant_conv/"):
            return f"{prefix}quant_conv.{wb}"
        if p.startswith("post_quant_conv/"):
            return f"{prefix}post_quant_conv.{wb}"
        if p.startswith("conv_in/"):
            return f"{pre}conv_in.{wb}"
        if p.startswith("conv_out/"):
            return f"{pre}conv_out.{wb}"
        if p.startswith("GroupNorm32_0/"):
            return f"{pre}conv_norm_out.{wb}" if layout == "diffusers" \
                else f"{pre}norm_out.{wb}"
        m = re.match(r"mid_res_(\d)/(.*)", p)
        if m:
            if layout == "diffusers":
                return f"{pre}mid_block.resnets.{m.group(1)}." + \
                    res_map[m.group(2)]
            return f"{pre}mid.block_{int(m.group(1)) + 1}." + res_map[m.group(2)]
        m = re.match(r"mid_attn/(.*)", p)
        if m:
            if layout == "diffusers":
                return f"{pre}mid_block.attentions.0." + attn_map[m.group(1)]
            return f"{pre}mid.attn_1." + attn_map[m.group(1)]
        m = re.match(r"down_(\d+)_res_(\d+)/(.*)", p)
        if m:
            lvl, blk, rest = int(m.group(1)), m.group(2), m.group(3)
            if layout == "diffusers":
                return f"{pre}down_blocks.{lvl}.resnets.{blk}." + res_map[rest]
            return f"{pre}down.{lvl}.block.{blk}." + res_map[rest]
        m = re.match(r"down_(\d+)_downsample/", p)
        if m:
            lvl = int(m.group(1))
            if layout == "diffusers":
                return f"{pre}down_blocks.{lvl}.downsamplers.0.conv.{wb}"
            return f"{pre}down.{lvl}.downsample.conv.{wb}"
        m = re.match(r"up_(\d+)_res_(\d+)/(.*)", p)
        if m:
            lvl, blk, rest = int(m.group(1)), m.group(2), m.group(3)
            if layout == "diffusers":
                return f"{pre}up_blocks.{L - 1 - lvl}.resnets.{blk}." + \
                    res_map[rest]
            return f"{pre}up.{lvl}.block.{blk}." + res_map[rest]
        m = re.match(r"up_(\d+)_upsample/", p)
        if m:
            lvl = int(m.group(1))
            if layout == "diffusers":
                return f"{pre}up_blocks.{L - 1 - lvl}.upsamplers.0.conv.{wb}"
            return f"{pre}up.{lvl}.upsample.conv.{wb}"
        return None

    return mapper


# ---------------------------------------------------------------------------
# CLIP mappings
# ---------------------------------------------------------------------------

def clip_text_mapper(prefix: str = "text_model."
                     ) -> Callable[[str], Optional[str]]:
    """transformers CLIPTextModel layout."""

    def mapper(path: str) -> Optional[str]:
        p = path
        wb = "weight" if p.endswith(("kernel", "scale", "embedding")) \
            else "bias"
        if p == "token_embedding/embedding":
            return f"{prefix}embeddings.token_embedding.weight"
        if p == "position_embedding":
            return f"{prefix}embeddings.position_embedding.weight"
        if p.startswith("final_ln/"):
            return f"{prefix}final_layer_norm.{wb}"
        m = re.match(r"layer_(\d+)/(.*)", p)
        if not m:
            return None
        i, rest = m.group(1), m.group(2)
        pre = f"{prefix}encoder.layers.{i}."
        sub = {
            "q": "self_attn.q_proj", "k": "self_attn.k_proj",
            "v": "self_attn.v_proj", "attn_out": "self_attn.out_proj",
            "ln1": "layer_norm1", "ln2": "layer_norm2",
            "fc1": "mlp.fc1", "fc2": "mlp.fc2",
        }
        name = rest.split("/")[0]
        return f"{pre}{sub[name]}.{wb}"

    return mapper


def clip_vision_mapper(prefix: str = "vision_model."
                       ) -> Callable[[str], Optional[str]]:
    """transformers CLIPVisionModel(WithProjection) layout."""

    def mapper(path: str) -> Optional[str]:
        p = path
        wb = "weight" if p.endswith(("kernel", "scale")) else "bias"
        if p == "class_embedding":
            return f"{prefix}embeddings.class_embedding"
        if p == "position_embedding":
            return f"{prefix}embeddings.position_embedding.weight"
        if p.startswith("patch_embed/"):
            return f"{prefix}embeddings.patch_embedding.weight"
        if p.startswith("pre_ln/"):
            return f"{prefix}pre_layrnorm.{wb}"
        if p.startswith("post_ln/"):
            return f"{prefix}post_layernorm.{wb}"
        if p.startswith("visual_projection/"):
            return "visual_projection.weight"
        m = re.match(r"layer_(\d+)/(.*)", p)
        if not m:
            return None
        i, rest = m.group(1), m.group(2)
        sub = {
            "q": "self_attn.q_proj", "k": "self_attn.k_proj",
            "v": "self_attn.v_proj", "attn_out": "self_attn.out_proj",
            "ln1": "layer_norm1", "ln2": "layer_norm2",
            "fc1": "mlp.fc1", "fc2": "mlp.fc2",
        }
        name = rest.split("/")[0]
        return f"{prefix}encoder.layers.{i}.{sub[name]}.{wb}"

    return mapper


def openai_clip_visual_to_transformers(sd: Dict[str, np.ndarray],
                                       prefix: str = "visual."
                                       ) -> Dict[str, np.ndarray]:
    """OpenAI-CLIP visual tower (fused in_proj, resblocks.*) → the
    transformers naming expected by clip_vision_mapper.  Used for the
    zero123 ckpt's FrozenCLIPImageEmbedder
    (ldm/modules/encoders/modules.py:343-382)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        r = k[len(prefix):]
        if r == "class_embedding":
            out["vision_model.embeddings.class_embedding"] = v
        elif r == "positional_embedding":
            out["vision_model.embeddings.position_embedding.weight"] = v
        elif r == "conv1.weight":
            out["vision_model.embeddings.patch_embedding.weight"] = v
        elif r == "ln_pre.weight":
            out["vision_model.pre_layrnorm.weight"] = v
        elif r == "ln_pre.bias":
            out["vision_model.pre_layrnorm.bias"] = v
        elif r == "ln_post.weight":
            out["vision_model.post_layernorm.weight"] = v
        elif r == "ln_post.bias":
            out["vision_model.post_layernorm.bias"] = v
        elif r == "proj":
            # OpenAI proj is [hidden, out] (x @ proj) = flax kernel layout;
            # transformers stores [out, hidden] — keep transformers layout
            out["visual_projection.weight"] = v.T
        else:
            m = re.match(r"transformer\.resblocks\.(\d+)\.(.*)", r)
            if not m:
                continue
            i, rest = m.group(1), m.group(2)
            pre = f"vision_model.encoder.layers.{i}."
            if rest.startswith("attn.in_proj_"):
                wb = rest.split("_")[-1]   # weight|bias
                q, kk, vv = np.split(v, 3, axis=0)
                out[f"{pre}self_attn.q_proj.{wb}"] = q
                out[f"{pre}self_attn.k_proj.{wb}"] = kk
                out[f"{pre}self_attn.v_proj.{wb}"] = vv
            else:
                sub = {
                    "attn.out_proj.weight": "self_attn.out_proj.weight",
                    "attn.out_proj.bias": "self_attn.out_proj.bias",
                    "ln_1.weight": "layer_norm1.weight",
                    "ln_1.bias": "layer_norm1.bias",
                    "ln_2.weight": "layer_norm2.weight",
                    "ln_2.bias": "layer_norm2.bias",
                    "mlp.c_fc.weight": "mlp.fc1.weight",
                    "mlp.c_fc.bias": "mlp.fc1.bias",
                    "mlp.c_proj.weight": "mlp.fc2.weight",
                    "mlp.c_proj.bias": "mlp.fc2.bias",
                }.get(rest)
                if sub:
                    out[pre + sub] = v
    return out


# ---------------------------------------------------------------------------
# top-level converters
# ---------------------------------------------------------------------------

def _find_weights(d: str, names=("diffusion_pytorch_model", "model")):
    for n in names:
        for ext in (".safetensors", ".bin", ".pt"):
            p = os.path.join(d, n + ext)
            if os.path.exists(p):
                return p
    raise FileNotFoundError(f"no weights under {d}")


def load_dir_state_dict(d: str, names=("diffusion_pytorch_model", "model")
                        ) -> Dict[str, np.ndarray]:
    """Load a diffusers/transformers model dir, following a shard index
    (`*.index.json`) when present — IF-XL's UNet and T5-XXL both ship
    sharded."""
    import json
    for n in names:
        for ext in (".safetensors", ".bin"):
            idx = os.path.join(d, n + ext + ".index.json")
            if os.path.exists(idx):
                with open(idx) as f:
                    shards = sorted(set(
                        json.load(f)["weight_map"].values()))
                out: Dict[str, np.ndarray] = {}
                for s in shards:
                    out.update(load_torch_state_dict(os.path.join(d, s)))
                return out
    return load_torch_state_dict(_find_weights(d, names))


def convert_sd(src: str, guidance, params: Dict[str, Any]) -> Dict[str, Any]:
    """src: diffusers model dir (unet/ vae/ text_encoder/) or a single
    CompVis .ckpt/.safetensors.  Returns a params dict for
    StableDiffusionGuidance with real weights."""
    out = dict(params)
    if os.path.isdir(src):
        u_sd = load_torch_state_dict(_find_weights(os.path.join(src, "unet")))
        v_sd = load_torch_state_dict(_find_weights(os.path.join(src, "vae")))
        t_sd = load_torch_state_dict(
            _find_weights(os.path.join(src, "text_encoder")))
        out["unet"], _ = _convert(params["unet"],
                                  unet_mapper_diffusers(guidance.unet.cfg),
                                  u_sd)
        out["vae"], _ = _convert(params["vae"],
                                 vae_mapper(guidance.vae.cfg, "diffusers"),
                                 v_sd)
        out["text"], _ = _convert(params["text"], clip_text_mapper(), t_sd)
    else:
        sd = load_torch_state_dict(src)
        out["unet"], _ = _convert(params["unet"],
                                  unet_mapper_ldm(guidance.unet.cfg), sd)
        out["vae"], _ = _convert(
            params["vae"],
            vae_mapper(guidance.vae.cfg, "ldm", "first_stage_model."), sd)
        # CompVis SD1.x text encoder is transformers CLIP under
        # cond_stage_model.transformer.; SD2.x is open_clip (unsupported
        # here — use the diffusers layout for 2.x text weights)
        try:
            out["text"], _ = _convert(
                params["text"],
                clip_text_mapper("cond_stage_model.transformer.text_model."),
                sd)
        except KeyError:
            pass
    return out


def convert_zero123(src: str, guidance, params: Dict[str, Any]
                    ) -> Dict[str, Any]:
    """zero123(-xl).ckpt (ldm layout + cc_projection + OpenAI-CLIP image
    encoder) → params for Zero123Guidance."""
    import jax.numpy as jnp
    sd = load_torch_state_dict(src)
    # prefer EMA weights when present (reference zero123_utils.py:40-44)
    ema = {k: v for k, v in sd.items() if k.startswith("model_ema.")}
    if ema:
        def ema_key(k):
            return "model_ema." + k[len("model."):].replace(".", "")
        remapped = {}
        for k in list(sd.keys()):
            if k.startswith("model.diffusion_model."):
                ek = ema_key(k)
                if ek in sd:
                    remapped[k] = sd[ek]
        sd.update(remapped)
    out = dict(params)
    out["unet"], _ = _convert(params["unet"],
                              unet_mapper_ldm(guidance.unet.cfg), sd)
    out["vae"], _ = _convert(
        params["vae"], vae_mapper(guidance.vae.cfg, "ldm",
                                  "first_stage_model."), sd)
    vis_sd = openai_clip_visual_to_transformers(
        sd, prefix="cond_stage_model.model.visual.")
    out["vision"], _ = _convert(params["vision"], clip_vision_mapper(),
                                vis_sd)
    out["cc_projection"] = {
        "kernel": jnp.asarray(sd["cc_projection.weight"].T),
        "bias": jnp.asarray(sd["cc_projection.bias"]),
    }
    return out


def convert_if(src: str, guidance, params: Dict[str, Any]
               ) -> Dict[str, Any]:
    """src: diffusers IF dir (unet/ text_encoder/, possibly sharded) →
    params for IFGuidance with real weights (+ the T5 encoder under
    't5').  Reference surface: IFPipeline.from_pretrained
    (guidance/if_utils.py:35-48)."""
    out = dict(params)
    u_sd = load_dir_state_dict(os.path.join(src, "unet"))
    out["unet"], _ = _convert(params["unet"],
                              if_unet_mapper(guidance.unet.cfg), u_sd)
    t5_dir = os.path.join(src, "text_encoder")
    if os.path.isdir(t5_dir):
        t_sd = load_dir_state_dict(t5_dir)
        if "shared.weight" not in t_sd and \
                "encoder.embed_tokens.weight" in t_sd:
            t_sd["shared.weight"] = t_sd["encoder.embed_tokens.weight"]
        import jax
        t5_template = guidance.t5.init(
            jax.random.PRNGKey(0),
            jax.numpy.zeros((1, 8), jax.numpy.int32))["params"]
        out["t5"], _ = _convert(t5_template, t5_mapper(), t_sd)
    return out


def dpt_mapper() -> Callable[[str], Optional[str]]:
    """models/dpt.DPTDepthModel ← the reference's vendored torch DPT
    (dpt.py:840-923, timm vit_base_resnet50_384 backbone naming), i.e. the
    omnidata_dpt_{depth,normal}_v2.ckpt layout.  The checkpoint's
    `scratch.refinenet4.resConfUnit1.*` weights are dead in the reference
    too (refinenet4 is called with a single input, dpt.py:891) and have no
    flax counterpart."""
    pm = "pretrained.model."

    def mapper(path: str) -> Optional[str]:
        p = path
        wb = "weight" if p.endswith(("kernel", "scale")) else "bias"
        if p.startswith("vit/"):
            p = p[4:]
            if p in ("cls_token", "pos_embed"):
                return pm + p
            if p.startswith("stem_conv/"):
                return pm + "patch_embed.backbone.stem.conv.weight"
            if p.startswith("stem_norm/"):
                return pm + f"patch_embed.backbone.stem.norm.{wb}"
            if p.startswith("patch_proj/"):
                return pm + f"patch_embed.proj.{wb}"
            if p.startswith("norm/"):
                return pm + f"norm.{wb}"
            m = re.match(r"stage(\d+)_block(\d+)/(\w+)/", p)
            if m:
                s, b, sub = m.groups()
                sub = {"downsample_conv": "downsample.conv",
                       "downsample_norm": "downsample.norm"}.get(sub, sub)
                return (pm + f"patch_embed.backbone.stages.{s}."
                        f"blocks.{b}.{sub}.{wb}")
            m = re.match(r"block(\d+)/(\w+)/", p)
            if m:
                i, sub = m.groups()
                sub = {"qkv": "attn.qkv", "proj": "attn.proj",
                       "fc1": "mlp.fc1", "fc2": "mlp.fc2"}.get(sub, sub)
                return pm + f"blocks.{i}.{sub}.{wb}"
            return None
        m = re.match(r"readout(\d)/project/", p)
        if m:
            return (f"pretrained.act_postprocess{m.group(1)}."
                    f"0.project.0.{wb}")
        if p.startswith("post3_conv/"):
            return f"pretrained.act_postprocess3.3.{wb}"
        if p.startswith("post4_conv/"):
            return f"pretrained.act_postprocess4.3.{wb}"
        if p.startswith("post4_down/"):
            return f"pretrained.act_postprocess4.4.{wb}"
        m = re.match(r"layer(\d)_rn/", p)
        if m:
            return f"scratch.layer{m.group(1)}_rn.weight"
        m = re.match(r"refinenet(\d)/(?:rcu(\d)/conv(\d)|out_conv)/", p)
        if m:
            i, rcu, conv = m.groups()
            sub = f"resConfUnit{rcu}.conv{conv}" if rcu else "out_conv"
            return f"scratch.refinenet{i}.{sub}.{wb}"
        m = re.match(r"head_conv(\d)/", p)
        if m:
            idx = {"1": 0, "2": 2, "3": 4}[m.group(1)]
            return f"scratch.output_conv.{idx}.{wb}"
        return None

    return mapper


def convert_dpt(src: str, params: Dict[str, Any]) -> Dict[str, Any]:
    """src: omnidata_dpt_{depth,normal}_v2.ckpt → params for
    models/dpt.DPTDepthModel (reference preprocess_image.py:83-92 load,
    including the 'state_dict' + 6-char-prefix wrapping)."""
    sd = load_torch_state_dict(src)
    if any(k.startswith("model.") for k in sd):        # pl 'model.' wrap
        sd = {k[6:]: v for k, v in sd.items() if k.startswith("model.")}
    tree, _ = _convert(params["params"], dpt_mapper(), sd)
    return {"params": tree}


def main(argv=None):
    ap = argparse.ArgumentParser("convert")
    ap.add_argument("--kind", choices=["sd", "zero123", "clip", "if", "dpt"],
                    required=True)
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True, help="output dir for npz files")
    ap.add_argument("--sd_version", default="2.1")
    args = ap.parse_args(argv)

    import jax
    from .params import save_params_npz
    os.makedirs(args.out, exist_ok=True)

    if args.kind == "sd":
        from ..guidance.sd import SDConfig, StableDiffusionGuidance
        g = StableDiffusionGuidance(SDConfig(sd_version=args.sd_version))
        params = g.init_params(jax.random.PRNGKey(0))
        params = convert_sd(args.src, g, params)
        for name in ("unet", "vae", "text"):
            save_params_npz(os.path.join(args.out, f"{name}.npz"),
                            params[name])
    elif args.kind == "if":
        from ..guidance.deepfloyd import IFConfig, IFGuidance
        cfg_json = os.path.join(args.src, "unet", "config.json")
        g = IFGuidance(IFConfig(
            unet_config_json=cfg_json if os.path.exists(cfg_json) else None))
        params = g.init_params(jax.random.PRNGKey(0))
        params = convert_if(args.src, g, params)
        for name in params:
            save_params_npz(os.path.join(args.out, f"{name}.npz"),
                            params[name])
    elif args.kind == "zero123":
        from ..guidance.zero123 import Zero123Config, Zero123Guidance
        g = Zero123Guidance(Zero123Config())
        params = g.init_params(jax.random.PRNGKey(0))
        params = convert_zero123(args.src, g, params)
        for name in ("unet", "vae", "vision", "cc_projection"):
            save_params_npz(os.path.join(args.out, f"{name}.npz"),
                            params[name])
    elif args.kind == "dpt":
        from ..models.dpt import DPTConfig, init_dpt
        cfg = DPTConfig.normal() if "normal" in os.path.basename(args.src) \
            else DPTConfig.depth()
        _, params = init_dpt(cfg, jax.random.PRNGKey(0))
        params = convert_dpt(args.src, params)
        name = "dpt_normal" if cfg.num_channels == 3 else "dpt_depth"
        save_params_npz(os.path.join(args.out, f"{name}.npz"), params)
    else:
        from ..guidance.clip import CLIPConfig, CLIPGuidance
        g = CLIPGuidance(CLIPConfig())
        params = g.init_params(jax.random.PRNGKey(0))
        sd = load_torch_state_dict(args.src)
        params["text"], _ = _convert(params["text"], clip_text_mapper(), sd,
                                     strict=False)
        params["vision"], _ = _convert(params["vision"],
                                       clip_vision_mapper(), sd,
                                       strict=False)
        save_params_npz(os.path.join(args.out, "clip.npz"), params)
    print(f"converted {args.kind} weights from {args.src} → {args.out}")


if __name__ == "__main__":
    main()
