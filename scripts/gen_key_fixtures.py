"""Generate real-checkpoint key/shape inventories → tests/fixtures/*.json.

Rationale (round-1 verdict item 5): converter tests against *synthesized*
state dicts only prove self-consistency.  These fixtures record the exact
(key, shape) inventory a published checkpoint presents, generated from the
authoritative architecture definitions available in this image:

  * t5_encoder_keys.json      — transformers T5EncoderModel (t5-v1_1-xxl
                                public config), meta-device instantiation:
                                GROUND TRUTH for the IF text encoder.
  * clip_sd2_text_keys.json   — transformers CLIPTextModel with the
                                public SD-2.1 text_encoder config (hidden
                                1024, 23 layers): GROUND TRUTH.
  * sd15_ldm_keys.json        — the vendored reference ldm UNetModel
                                (v1-inference params) + AutoencoderKL
                                encoder/decoder/quant convs, meta-device:
                                GROUND TRUTH for the CompVis .ckpt layout.
  * zero123_ldm_keys.json     — same UNetModel with the zero123 yaml
                                params (in_channels 8) + VAE +
                                cc_projection + OpenAI ViT-L/14 visual
                                tower (naming reconstructed from the
                                stable OpenAI-CLIP module layout).

The reference's vendored ldm is SD1.x-era (no use_linear_in_transformer),
so an exact SD-2.1 *ldm single-ckpt* inventory cannot be generated here;
the supported SD-2.x path is the diffusers directory layout.

Run: python scripts/gen_key_fixtures.py   (writes tests/fixtures/)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "fixtures")


def _shapes(module, prefix="") -> dict:
    return {prefix + k: list(v.shape)
            for k, v in module.state_dict().items()}


def gen_t5():
    import torch
    from accelerate import init_empty_weights
    from transformers import T5Config, T5EncoderModel

    cfg = T5Config(
        vocab_size=32128, d_model=4096, d_kv=64, d_ff=10240,
        num_layers=24, num_heads=64, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
        is_encoder_decoder=False, use_cache=False, tie_word_embeddings=False)
    with init_empty_weights():
        m = T5EncoderModel(cfg)
    return _shapes(m)


def gen_clip_text():
    from accelerate import init_empty_weights
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=1024, intermediate_size=4096,
        num_hidden_layers=23, num_attention_heads=16,
        max_position_embeddings=77, hidden_act="gelu")
    with init_empty_weights():
        m = CLIPTextModel(cfg)
    return {k: v for k, v in _shapes(m).items()
            if "position_ids" not in k}


def _stub_missing():
    """The vendored ldm imports GPU-era deps we don't need for meta-device
    instantiation — stub the missing ones."""
    import types
    for name in ("torchvision", "torchvision.utils", "kornia",
                 "kornia.geometry", "omegaconf", "omegaconf.listconfig"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
    if not hasattr(sys.modules["omegaconf.listconfig"], "ListConfig"):
        class ListConfig(list):
            pass
        sys.modules["omegaconf.listconfig"].ListConfig = ListConfig
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def _ldm_unet(**kw):
    import torch
    _stub_missing()
    from ldm.modules.diffusionmodules.openaimodel import UNetModel
    with torch.device("meta"):
        return UNetModel(**kw)


def _ldm_vae():
    import torch
    _stub_missing()
    from ldm.modules.diffusionmodules.model import Decoder, Encoder
    dd = dict(double_z=True, z_channels=4, resolution=256, in_channels=3,
              out_ch=3, ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2,
              attn_resolutions=[], dropout=0.0)
    with torch.device("meta"):
        enc = Encoder(**dd)
        dec = Decoder(**dd)
        quant = torch.nn.Conv2d(8, 8, 1)
        post = torch.nn.Conv2d(4, 4, 1)
    out = _shapes(enc, "first_stage_model.encoder.")
    out.update(_shapes(dec, "first_stage_model.decoder."))
    out.update(_shapes(quant, "first_stage_model.quant_conv."))
    out.update(_shapes(post, "first_stage_model.post_quant_conv."))
    return out


def gen_sd15_ldm():
    u = _ldm_unet(image_size=32, in_channels=4, out_channels=4,
                  model_channels=320, attention_resolutions=[4, 2, 1],
                  num_res_blocks=2, channel_mult=[1, 2, 4, 4], num_heads=8,
                  use_spatial_transformer=True, transformer_depth=1,
                  context_dim=768, legacy=False)
    out = _shapes(u, "model.diffusion_model.")
    out.update(_ldm_vae())
    return out


def _vit_l14_visual(prefix="cond_stage_model.model.visual."):
    """OpenAI CLIP ViT-L/14 visual tower (deleted-text FrozenCLIPImageEmbedder
    checkpoint layout, reference ldm/modules/encoders/modules.py:343-358).
    Naming reconstructed from the stable OpenAI-CLIP module layout."""
    W, L, FF, P, IMG, PROJ = 1024, 24, 4096, 14, 224, 768
    n_tok = (IMG // P) ** 2 + 1
    out = {
        prefix + "class_embedding": [W],
        prefix + "positional_embedding": [n_tok, W],
        prefix + "conv1.weight": [W, 3, P, P],
        prefix + "ln_pre.weight": [W], prefix + "ln_pre.bias": [W],
        prefix + "ln_post.weight": [W], prefix + "ln_post.bias": [W],
        prefix + "proj": [W, PROJ],
    }
    for i in range(L):
        b = f"{prefix}transformer.resblocks.{i}."
        out.update({
            b + "attn.in_proj_weight": [3 * W, W],
            b + "attn.in_proj_bias": [3 * W],
            b + "attn.out_proj.weight": [W, W],
            b + "attn.out_proj.bias": [W],
            b + "ln_1.weight": [W], b + "ln_1.bias": [W],
            b + "ln_2.weight": [W], b + "ln_2.bias": [W],
            b + "mlp.c_fc.weight": [FF, W], b + "mlp.c_fc.bias": [FF],
            b + "mlp.c_proj.weight": [W, FF], b + "mlp.c_proj.bias": [W],
        })
    return out


def gen_zero123_ldm():
    # params from /root/reference/pretrained/zero123/
    # sd-objaverse-finetune-c_concat-256.yaml (the shipped model config)
    u = _ldm_unet(image_size=32, in_channels=8, out_channels=4,
                  model_channels=320, attention_resolutions=[4, 2, 1],
                  num_res_blocks=2, channel_mult=[1, 2, 4, 4], num_heads=8,
                  use_spatial_transformer=True, transformer_depth=1,
                  context_dim=768, legacy=False)
    out = _shapes(u, "model.diffusion_model.")
    out.update(_ldm_vae())
    out["cc_projection.weight"] = [768, 772]
    out["cc_projection.bias"] = [768]
    out.update(_vit_l14_visual())
    return out


def gen_if_xl():
    """IF-I-XL UNet diffusers-layout inventory — RECONSTRUCTED from our own
    IFUNet + mapper at the xl() preset (diffusers isn't installable here and
    zero egress forbids fetching the real config/checkpoint).  The value of
    recording it: any accidental change to the module naming, the mapper, or
    the preset dims fails the stability test instead of silently breaking
    real-weight conversion."""
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    from dreamfusion_tpu.models.if_unet import IFUNet, IFUNetConfig
    from dreamfusion_tpu.utils.convert import _flax_paths, if_unet_mapper

    cfg = IFUNetConfig.xl()
    m = IFUNet(cfg)
    t = jax.eval_shape(lambda k: m.init(
        k, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1,)),
        jnp.zeros((1, 77, cfg.encoder_hid_dim))), jax.random.PRNGKey(0)
    )["params"]
    mapper = if_unet_mapper(cfg)
    out = {}
    for path, leaf in _flax_paths(t):
        tk = mapper(path)
        assert tk is not None, path
        s = list(leaf.shape)
        if len(s) == 4:                       # flax conv → torch conv
            s = [s[3], s[2], s[0], s[1]]
        elif len(s) == 2 and path.endswith("kernel"):
            s = [s[1], s[0]]
        out[tk] = s
    return out


def gen_dpt(num_channels=1):
    """omnidata_dpt_{depth,normal}_v2.ckpt inventory: the reference's
    DPTDepthModel(backbone='vitb_rn50_384', readout='project')
    (/root/reference/dpt.py:840-923) whose backbone is timm
    vit_base_resnet50_384.  Reconstructed structurally from the module
    definitions (timm isn't installed here): ResNetV2 (3,4,9) hybrid stem
    with StdConv+GroupNorm32, ViT-B/16 at 384² (577 tokens), project
    readout, scratch/refinenet decoder, DPTDepthModel head."""
    D, MLP, GRID = 768, 3072, 24
    pm = "pretrained.model."
    out = {
        pm + "cls_token": [1, 1, D],
        pm + "pos_embed": [1, GRID * GRID + 1, D],
        pm + "patch_embed.proj.weight": [D, 1024, 1, 1],
        pm + "patch_embed.proj.bias": [D],
        pm + "patch_embed.backbone.stem.conv.weight": [64, 3, 7, 7],
        pm + "patch_embed.backbone.stem.norm.weight": [64],
        pm + "patch_embed.backbone.stem.norm.bias": [64],
        pm + "norm.weight": [D], pm + "norm.bias": [D],
    }
    # ResNetV2 stages (non-preact bottlenecks, GroupNorm32)
    chans = [(64, 64, 256), (256, 128, 512), (512, 256, 1024)]
    for s, depth in enumerate((3, 4, 9)):
        cin, mid, cout = chans[s]
        for b in range(depth):
            p = pm + f"patch_embed.backbone.stages.{s}.blocks.{b}."
            bin_ = cin if b == 0 else cout
            out.update({
                p + "conv1.weight": [mid, bin_, 1, 1],
                p + "norm1.weight": [mid], p + "norm1.bias": [mid],
                p + "conv2.weight": [mid, mid, 3, 3],
                p + "norm2.weight": [mid], p + "norm2.bias": [mid],
                p + "conv3.weight": [cout, mid, 1, 1],
                p + "norm3.weight": [cout], p + "norm3.bias": [cout],
            })
            if b == 0:
                out.update({
                    p + "downsample.conv.weight": [cout, bin_, 1, 1],
                    p + "downsample.norm.weight": [cout],
                    p + "downsample.norm.bias": [cout],
                })
    for i in range(12):
        p = pm + f"blocks.{i}."
        out.update({
            p + "norm1.weight": [D], p + "norm1.bias": [D],
            p + "attn.qkv.weight": [3 * D, D], p + "attn.qkv.bias": [3 * D],
            p + "attn.proj.weight": [D, D], p + "attn.proj.bias": [D],
            p + "norm2.weight": [D], p + "norm2.bias": [D],
            p + "mlp.fc1.weight": [MLP, D], p + "mlp.fc1.bias": [MLP],
            p + "mlp.fc2.weight": [D, MLP], p + "mlp.fc2.bias": [D],
        })
    # act_postprocess3/4 (Sequential index naming; 1/2 are Identity for the
    # rn50 hybrid, dpt.py:440-446); readout 'project' adds project.0 Linear
    for n, extra in (("3", False), ("4", True)):
        p = f"pretrained.act_postprocess{n}."
        out.update({
            p + "0.project.0.weight": [D, 2 * D],
            p + "0.project.0.bias": [D],
            p + "3.weight": [D, D, 1, 1], p + "3.bias": [D],
        })
        if extra:
            out[p + "4.weight"] = [D, D, 3, 3]
            out[p + "4.bias"] = [D]
    # scratch: RN convs (no bias), refinenets, head
    F = 256
    for i, cin in enumerate((256, 512, D, D), start=1):
        out[f"scratch.layer{i}_rn.weight"] = [F, cin, 3, 3]
    for i in range(1, 5):
        p = f"scratch.refinenet{i}."
        for rcu in ("resConfUnit1", "resConfUnit2"):
            out.update({
                p + rcu + ".conv1.weight": [F, F, 3, 3],
                p + rcu + ".conv1.bias": [F],
                p + rcu + ".conv2.weight": [F, F, 3, 3],
                p + rcu + ".conv2.bias": [F],
            })
        out[p + "out_conv.weight"] = [F, F, 1, 1]
        out[p + "out_conv.bias"] = [F]
    out.update({
        "scratch.output_conv.0.weight": [F // 2, F, 3, 3],
        "scratch.output_conv.0.bias": [F // 2],
        "scratch.output_conv.2.weight": [32, F // 2, 3, 3],
        "scratch.output_conv.2.bias": [32],
        "scratch.output_conv.4.weight": [num_channels, 32, 1, 1],
        "scratch.output_conv.4.bias": [num_channels],
    })
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, fn in [("t5_encoder_keys", gen_t5),
                     ("clip_sd2_text_keys", gen_clip_text),
                     ("sd15_ldm_keys", gen_sd15_ldm),
                     ("zero123_ldm_keys", gen_zero123_ldm),
                     ("if_xl_unet_keys", gen_if_xl),
                     ("omnidata_dpt_keys", gen_dpt)]:
        inv = fn()
        path = os.path.join(OUT, name + ".json")
        with open(path, "w") as f:
            json.dump(inv, f, indent=0, sort_keys=True)
        print(f"{path}: {len(inv)} keys")


if __name__ == "__main__":
    main()
