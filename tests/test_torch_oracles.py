"""Torch OUTPUT-parity oracles for every converted guidance tower.

Round-4 verdict item 1: key/shape-inventory audits (test_convert_fixtures)
prove a mapper is structurally complete, but a wrong GroupNorm eps, gelu
variant, attention scale, or time-embed order would still pass them and
silently ruin a real-weight run.  These tests instantiate tiny-dim TORCH
modules from the reference's own vendored code —
/root/reference/ldm/modules/diffusionmodules/openaimodel.py:414 (UNetModel),
/root/reference/ldm/modules/diffusionmodules/model.py:368,462 (VAE
Encoder/Decoder used by ldm/models/autoencoder.py:285) — plus transformers
CLIPTextModel/CLIPVisionModel, run utils/convert.py on their real state
dicts, and assert the flax outputs equal the torch outputs (like the T5
oracle, test_convert_fixtures.py).

The reference modules are imported read-only from /root/reference with a
3-function `ldm.util` shim (the real one needs torchvision/cv2, absent
here).  Nothing is copied; the torch code runs as a black-box oracle.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dreamfusion_tpu.utils import convert as C

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(os.path.join(REF, "ldm")):
    pytest.skip(f"reference tree not present at {REF}",
                allow_module_level=True)


# ---------------------------------------------------------------------------
# reference-module import shim
# ---------------------------------------------------------------------------

def _ldm():
    """Import the vendored ldm diffusion modules from /root/reference.

    `ldm.util` is replaced by a 3-function shim because the real module
    imports torchvision/cv2/matplotlib (not installed); openaimodel.py and
    model.py only use `exists` / `instantiate_from_config` from it.
    """
    if "ldm" not in sys.modules:
        pkg = types.ModuleType("ldm")
        pkg.__path__ = [os.path.join(REF, "ldm")]
        sys.modules["ldm"] = pkg
        util = types.ModuleType("ldm.util")
        util.exists = lambda v: v is not None
        util.default = lambda v, d: v if v is not None else (
            d() if callable(d) else d)
        util.instantiate_from_config = None  # only called for attn_type none
        sys.modules["ldm.util"] = util
    try:
        import omegaconf  # noqa: F401  (UNetModel touches ListConfig)
    except ImportError:
        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        om.listconfig = lc
        sys.modules.setdefault("omegaconf", om)
        sys.modules.setdefault("omegaconf.listconfig", lc)
    from ldm.modules.diffusionmodules import model, openaimodel
    return openaimodel, model


def _sd(module, prefix):
    return {prefix + k: v.detach().numpy()
            for k, v in module.state_dict().items()}


def _nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _nchw(y_nhwc) -> np.ndarray:
    return np.transpose(np.asarray(y_nhwc), (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# UNetModel (ldm / openaimodel) — the zero123 + CompVis-SD tower
# ---------------------------------------------------------------------------

def _tiny_torch_unet(openaimodel, in_channels=4, num_heads=2,
                     num_head_channels=-1):
    torch.manual_seed(0)
    return openaimodel.UNetModel(
        image_size=8, in_channels=in_channels, model_channels=32,
        out_channels=4, num_res_blocks=1,
        attention_resolutions=[2],          # ds=2 → level 1 of (1, 2)
        channel_mult=(1, 2), num_heads=num_heads,
        num_head_channels=num_head_channels,
        use_spatial_transformer=True, transformer_depth=1, context_dim=32,
        use_checkpoint=False, legacy=False, dropout=0.0,
    ).eval()


def _tiny_flax_unet(in_channels=4, head_dim=None):
    from dreamfusion_tpu.models.unet import UNetConfig, UNet2DCondition
    cfg = UNetConfig(
        in_channels=in_channels, out_channels=4, model_channels=32,
        channel_mult=(1, 2), num_res_blocks=1, attn_levels=(False, True),
        context_dim=32, num_heads=2, head_dim=head_dim, dtype=jnp.float32)
    m = UNet2DCondition(cfg)
    t = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 8, 8, in_channels)),
                         jnp.zeros((1,)), jnp.zeros((1, 6, 32))),
        jax.random.PRNGKey(0))["params"]
    return m, cfg, t


def _unet_io(in_channels):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, in_channels, 8, 8)).astype(np.float32)
    t = np.array([517.0, 31.0], dtype=np.float32)
    ctx = rng.standard_normal((2, 6, 32)).astype(np.float32)
    return x, t, ctx


def _run_unet_pair(tm, m, params, in_channels):
    x, t, ctx = _unet_io(in_channels)
    with torch.no_grad():
        ref = tm(torch.tensor(x), timesteps=torch.tensor(t),
                 context=torch.tensor(ctx)).numpy()
    out = m.apply({"params": params}, _nhwc(x), jnp.asarray(t),
                  jnp.asarray(ctx))
    np.testing.assert_allclose(_nchw(out), ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("in_channels", [4, 8])
def test_unet_ldm_torch_oracle(in_channels):
    """unet_mapper_ldm: SD-CompVis (in=4) and zero123-hybrid (in=8)
    topologies — converted flax outputs must equal the torch UNetModel."""
    openaimodel, _ = _ldm()
    tm = _tiny_torch_unet(openaimodel, in_channels=in_channels)
    sd = _sd(tm, "model.diffusion_model.")
    m, cfg, t = _tiny_flax_unet(in_channels=in_channels)
    params, missing = C._convert(t, C.unet_mapper_ldm(cfg), sd)
    assert not missing
    _run_unet_pair(tm, m, params, in_channels)


def test_unet_ldm_torch_oracle_head_dim():
    """SD2-style fixed head width (num_head_channels / head_dim=16)."""
    openaimodel, _ = _ldm()
    tm = _tiny_torch_unet(openaimodel, num_heads=-1, num_head_channels=16)
    sd = _sd(tm, "model.diffusion_model.")
    m, cfg, t = _tiny_flax_unet(head_dim=16)
    params, missing = C._convert(t, C.unet_mapper_ldm(cfg), sd)
    assert not missing
    _run_unet_pair(tm, m, params, 4)


def test_unet_diffusers_mapper_torch_oracle():
    """unet_mapper_diffusers, output-verified without diffusers installed:
    rename the torch UNetModel state dict through the ldm→diffusers key
    bridge (the exact naming diffusers' convert_from_ckpt produces), then
    convert via the diffusers-layout mapper — outputs must still match."""
    openaimodel, _ = _ldm()
    tm = _tiny_torch_unet(openaimodel)
    sd = _sd(tm, "model.diffusion_model.")
    m, cfg, t = _tiny_flax_unet()
    bridge = C.ldm_to_diffusers_unet_key(cfg)
    dsd = {}
    for k, v in sd.items():
        nk = bridge(k)
        assert nk is not None, f"bridge dropped {k}"
        dsd[nk] = v
    params, missing = C._convert(t, C.unet_mapper_diffusers(cfg), dsd)
    assert not missing
    _run_unet_pair(tm, m, params, 4)


# ---------------------------------------------------------------------------
# AutoencoderKL (ldm first_stage_model) — encode moments + decode
# ---------------------------------------------------------------------------

def _tiny_torch_vae(model):
    torch.manual_seed(1)
    dd = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=[], dropout=0.0, resamp_with_conv=True,
              in_channels=3, resolution=32, z_channels=4, double_z=True)
    enc = model.Encoder(**dd).eval()
    dec = model.Decoder(**dd).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    return enc, dec, quant, post_quant


def _tiny_flax_vae():
    from dreamfusion_tpu.models.vae import VAEConfig, AutoencoderKL
    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                    dtype=jnp.float32)
    m = AutoencoderKL(cfg)
    t = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 32, 32, 3)), k),
        jax.random.PRNGKey(0))["params"]
    return m, cfg, t


@pytest.mark.parametrize("layout", ["ldm", "diffusers"])
def test_vae_torch_oracle(layout):
    """vae_mapper (both layouts): converted flax encode-moments and decode
    must equal the torch Encoder/Decoder from the reference's model.py
    (the modules AutoencoderKL is built from, autoencoder.py:285-342)."""
    _, model = _ldm()
    enc, dec, quant, post_quant = _tiny_torch_vae(model)
    sd = {}
    sd.update(_sd(enc, "first_stage_model.encoder."))
    sd.update(_sd(dec, "first_stage_model.decoder."))
    sd.update(_sd(quant, "first_stage_model.quant_conv."))
    sd.update(_sd(post_quant, "first_stage_model.post_quant_conv."))

    m, cfg, t = _tiny_flax_vae()
    if layout == "ldm":
        params, missing = C._convert(
            t, C.vae_mapper(cfg, "ldm", "first_stage_model."), sd)
    else:
        bridge = C.ldm_to_diffusers_vae_key(cfg)
        dsd = {}
        for k, v in sd.items():
            nk = bridge(k)
            assert nk is not None, f"bridge dropped {k}"
            dsd[nk] = v
        params, missing = C._convert(t, C.vae_mapper(cfg, "diffusers"), dsd)
    assert not missing

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        moments = quant(enc(torch.tensor(x)))
        r_mean, r_logvar = moments.chunk(2, dim=1)
        z = r_mean  # deterministic .mode() path (zero123 c_concat)
        recon = dec(post_quant(z)).numpy()

    mom = m.apply({"params": params}, _nhwc(x), method="encode")
    np.testing.assert_allclose(_nchw(mom.mean), r_mean.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(_nchw(mom.logvar), r_logvar.numpy(),
                               atol=1e-4, rtol=1e-3)
    # our decode() takes *scaled* latents and divides by scale_factor
    out = m.apply({"params": params},
                  _nhwc(z.numpy()) * cfg.scale_factor, method="decode")
    np.testing.assert_allclose(_nchw(out), recon, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# CLIP text + vision (transformers oracles)
# ---------------------------------------------------------------------------

def test_clip_text_torch_oracle():
    """clip_text_mapper: converted flax last_hidden_state must equal a real
    transformers CLIPTextModel (the SD text encoder,
    guidance/sd_utils.py:76-83)."""
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel

    from dreamfusion_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder

    cfg = CLIPTextConfig.tiny()
    hf = HFCfg(vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
               intermediate_size=cfg.hidden_size * 4,
               num_hidden_layers=cfg.num_layers,
               num_attention_heads=cfg.num_heads,
               max_position_embeddings=cfg.max_len,
               hidden_act="quick_gelu" if cfg.use_quick_gelu else "gelu",
               attention_dropout=0.0, eos_token_id=2)
    torch.manual_seed(3)
    tm = CLIPTextModel(hf).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    m = CLIPTextEncoder(cfg)
    t = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, cfg.max_len), jnp.int32)),
        jax.random.PRNGKey(0))["params"]
    params, missing = C._convert(t, C.clip_text_mapper(), sd)
    assert not missing

    ids = np.array([[49, 3, 7, 11, 250, 9, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0]],
                   dtype=np.int32) % cfg.vocab_size
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids.astype(np.int64))
                 ).last_hidden_state.numpy()
    out = np.asarray(m.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_clip_vision_torch_oracle():
    """clip_vision_mapper: converted flax (projected pooled, last_hidden)
    must equal transformers CLIPVisionModelWithProjection — the zero123
    image embedder (FrozenCLIPImageEmbedder, encoders/modules.py:343)."""
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection

    from dreamfusion_tpu.models.clip import (CLIPVisionConfig,
                                             CLIPVisionEncoder)

    cfg = CLIPVisionConfig.tiny()
    hf = HFCfg(hidden_size=cfg.hidden_size,
               intermediate_size=cfg.hidden_size * 4,
               num_hidden_layers=cfg.num_layers,
               num_attention_heads=cfg.num_heads,
               image_size=cfg.image_size, patch_size=cfg.patch_size,
               projection_dim=cfg.projection_dim,
               hidden_act="quick_gelu" if cfg.use_quick_gelu else "gelu",
               attention_dropout=0.0)
    torch.manual_seed(4)
    tm = CLIPVisionModelWithProjection(hf).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    m = CLIPVisionEncoder(cfg)
    t = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, cfg.image_size, cfg.image_size,
                                       3))),
        jax.random.PRNGKey(0))["params"]
    params, missing = C._convert(t, C.clip_vision_mapper(), sd)
    assert not missing

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3, cfg.image_size, cfg.image_size)
                            ).astype(np.float32)
    with torch.no_grad():
        ref = tm(pixel_values=torch.tensor(x))
        ref_proj = ref.image_embeds.numpy()
        ref_hidden = ref.last_hidden_state.numpy()
    proj, hidden = m.apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden,
                               atol=1e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(proj), ref_proj,
                               atol=1e-4, rtol=2e-3)
