"""Checkpoint-conversion tests.

Strategy: for each mapper, synthesize a torch-layout state dict by running
the mapper over every flax leaf and applying the INVERSE layout transform
to a random flax-shaped array.  Conversion must then reproduce the random
arrays exactly — proving the key mapping is total (no unmapped leaf), the
names are internally consistent, and the layout transposes round-trip.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dreamfusion_tpu.utils import convert as C


def synth_state_dict(template, mapper, rng):
    """(state_dict, expected_tree): torch-layout arrays + the flax arrays
    conversion must reproduce."""
    sd = {}

    def fill(kp, leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)
        tk = mapper(path)
        assert tk is not None, f"unmapped flax path: {path}"
        arr = rng.standard_normal(leaf.shape).astype(np.float32)
        if arr.ndim == 4:                       # flax conv → torch conv
            sd[tk] = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 2 and path.endswith("kernel"):
            sd[tk] = arr.T                      # flax dense → torch linear
        else:
            sd[tk] = arr
        return jnp.asarray(arr)

    expected = jax.tree_util.tree_map_with_path(fill, template)
    return sd, expected


def assert_trees_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def tiny_unet(in_ch=4, attn=(False, True)):
    from dreamfusion_tpu.models.unet import UNet2DCondition, UNetConfig
    cfg = UNetConfig(in_channels=in_ch, out_channels=4, model_channels=8,
                     channel_mult=(1, 2), num_res_blocks=2,
                     attn_levels=attn, context_dim=16, num_heads=2,
                     dtype=jnp.float32)
    m = UNet2DCondition(cfg)
    t = jax.eval_shape(lambda: m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, in_ch)),
        jnp.zeros((1,)), jnp.zeros((1, 3, 16))))["params"]
    return m, cfg, t


def tiny_vae():
    from dreamfusion_tpu.models.vae import AutoencoderKL, VAEConfig
    cfg = VAEConfig(ch=8, ch_mult=(1, 2), z_channels=4, dtype=jnp.float32)
    m = AutoencoderKL(cfg)
    t = jax.eval_shape(lambda: m.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(0)))["params"]
    return m, cfg, t


@pytest.mark.parametrize("mapper_kind", ["diffusers", "ldm"])
def test_unet_mapping_total_and_roundtrip(mapper_kind):
    rng = np.random.default_rng(0)
    m, cfg, t = tiny_unet()
    mapper = C.unet_mapper_diffusers(cfg) if mapper_kind == "diffusers" \
        else C.unet_mapper_ldm(cfg)
    sd, expected = synth_state_dict(t, mapper, rng)
    out, missing = C._convert(t, mapper, sd)
    assert not missing
    assert_trees_equal(out, expected)
    # every synthesized torch key has the expected layout family
    if mapper_kind == "ldm":
        assert any(k.startswith("model.diffusion_model.input_blocks.")
                   for k in sd)
        assert "model.diffusion_model.out.2.weight" in sd
    else:
        assert any(k.startswith("down_blocks.0.resnets.") for k in sd)
        assert "conv_norm_out.weight" in sd


def test_unet_ldm_block_indices_cover_reference_shape():
    """SD-shape config (4 levels, 2 res blocks, attn on 0-2): the ldm
    input/output block numbering must match openaimodel.py's module order:
    input_blocks 0..11, output_blocks 0..11."""
    from dreamfusion_tpu.models.unet import UNetConfig
    cfg = UNetConfig()  # SD1.5 shape
    mapper = C.unet_mapper_ldm(cfg)
    ks = {
        mapper("down_0_res_0/conv1/kernel"),
        mapper("down_0_res_1/conv1/kernel"),
        mapper("down_0_downsample/kernel"),
        mapper("down_3_res_1/conv1/kernel"),
        mapper("up_3_res_0/conv1/kernel"),
        mapper("up_0_res_2/conv1/kernel"),
        mapper("up_3_upsample/kernel"),
        mapper("up_1_upsample/kernel"),
    }
    assert ks == {
        "model.diffusion_model.input_blocks.1.0.in_layers.2.weight",
        "model.diffusion_model.input_blocks.2.0.in_layers.2.weight",
        "model.diffusion_model.input_blocks.3.0.op.weight",
        "model.diffusion_model.input_blocks.11.0.in_layers.2.weight",
        "model.diffusion_model.output_blocks.0.0.in_layers.2.weight",
        "model.diffusion_model.output_blocks.11.0.in_layers.2.weight",
        # lvl 3 has no attention → upsample is submodule .1; lvl 1 has
        # attention → submodule .2
        "model.diffusion_model.output_blocks.2.1.conv.weight",
        "model.diffusion_model.output_blocks.8.2.conv.weight",
    }


@pytest.mark.parametrize("layout", ["diffusers", "ldm"])
def test_vae_mapping_total_and_roundtrip(layout):
    rng = np.random.default_rng(1)
    m, cfg, t = tiny_vae()
    prefix = "" if layout == "diffusers" else "first_stage_model."
    mapper = C.vae_mapper(cfg, layout, prefix)
    sd, expected = synth_state_dict(t, mapper, rng)
    out, missing = C._convert(t, mapper, sd)
    assert not missing
    assert_trees_equal(out, expected)
    if layout == "ldm":
        assert any(k.startswith("first_stage_model.decoder.up.1.block.")
                   for k in sd)


def test_clip_text_mapping():
    from dreamfusion_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    rng = np.random.default_rng(2)
    tc = CLIPTextConfig.tiny()
    enc = CLIPTextEncoder(tc)
    t = jax.eval_shape(lambda: enc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, tc.max_len), jnp.int32)
    ))["params"]
    mapper = C.clip_text_mapper()
    sd, expected = synth_state_dict(t, mapper, rng)
    assert "text_model.embeddings.token_embedding.weight" in sd
    out, missing = C._convert(t, mapper, sd)
    assert not missing
    assert_trees_equal(out, expected)


def test_openai_clip_visual_in_proj_split():
    """Fused qkv in_proj must split into q/k/v in order."""
    h = 8
    w = np.arange(3 * h * h, dtype=np.float32).reshape(3 * h, h)
    b = np.arange(3 * h, dtype=np.float32)
    sd = {"visual.transformer.resblocks.0.attn.in_proj_weight": w,
          "visual.transformer.resblocks.0.attn.in_proj_bias": b,
          "visual.proj": np.zeros((h, 4), np.float32)}
    out = C.openai_clip_visual_to_transformers(sd)
    np.testing.assert_array_equal(
        out["vision_model.encoder.layers.0.self_attn.q_proj.weight"], w[:h])
    np.testing.assert_array_equal(
        out["vision_model.encoder.layers.0.self_attn.v_proj.weight"],
        w[2 * h:])
    np.testing.assert_array_equal(
        out["vision_model.encoder.layers.0.self_attn.k_proj.bias"], b[h:2 * h])
    assert out["visual_projection.weight"].shape == (4, h)


def test_fit_linear_conv_bridges():
    """SD2.1 stores SpatialTransformer proj_in as a Linear; our module is a
    1×1 conv — and vice versa for the diffusers VAE attention."""
    lin = np.arange(12, dtype=np.float32).reshape(4, 3)       # [O=4, I=3]
    conv_leaf = jax.ShapeDtypeStruct((1, 1, 3, 4), np.float32)
    got = C._fit(lin, conv_leaf, "t")
    np.testing.assert_array_equal(got[0, 0], lin.T)
    conv = np.arange(12, dtype=np.float32).reshape(4, 3, 1, 1)  # conv [O,I,1,1]
    lin_leaf = jax.ShapeDtypeStruct((3, 4), np.float32)
    got2 = C._fit(conv, lin_leaf, "t")
    np.testing.assert_array_equal(got2, conv[:, :, 0, 0].T)


def test_convert_sd_from_ldm_ckpt_file(tmp_path):
    """End-to-end: a synthetic CompVis-layout .pt ckpt loads into a tiny
    SD guidance params tree through convert_sd."""
    import torch

    from dreamfusion_tpu.guidance.sd import SDConfig, StableDiffusionGuidance

    g = StableDiffusionGuidance(SDConfig(tiny=True, image_size=16,
                                         latent_size=8))
    params = g.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    u_sd, u_exp = synth_state_dict(params["unet"],
                                   C.unet_mapper_ldm(g.unet.cfg), rng)
    v_sd, v_exp = synth_state_dict(
        params["vae"], C.vae_mapper(g.vae.cfg, "ldm", "first_stage_model."),
        rng)
    t_sd, t_exp = synth_state_dict(
        params["text"],
        C.clip_text_mapper("cond_stage_model.transformer.text_model."), rng)
    blob = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in {**u_sd, **v_sd, **t_sd}.items()}
    p = str(tmp_path / "sd.ckpt")
    torch.save({"state_dict": blob}, p)

    out = C.convert_sd(p, g, params)
    assert_trees_equal(out["unet"], u_exp)
    assert_trees_equal(out["vae"], v_exp)
    assert_trees_equal(out["text"], t_exp)
