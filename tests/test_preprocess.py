"""preprocess_image: GrabCut matte, recenter, normal-from-depth, CLI."""

import numpy as np
import pytest
from PIL import Image


def synthetic_object_image(size=96):
    """White background + colored disc: trivially separable."""
    img = np.full((size, size, 3), 240, np.uint8)
    yy, xx = np.mgrid[:size, :size]
    # off-center disc so recentering has something to do
    disc = (yy - size * 0.6) ** 2 + (xx - size * 0.35) ** 2 < (size * 0.2) ** 2
    img[disc] = (200, 40, 40)
    return img, disc


def test_grabcut_matte_separates_disc():
    from dreamfusion_tpu.preprocess_image import BackgroundRemoval
    img, disc = synthetic_object_image()
    rgba = BackgroundRemoval._grabcut(img)
    assert rgba.shape == img.shape[:2] + (4,)
    alpha = rgba[..., 3] > 127
    inter = (alpha & disc).sum()
    union = (alpha | disc).sum()
    assert inter / union > 0.7, "matte should mostly match the disc"


def test_recenter_centers_and_scales():
    from dreamfusion_tpu.preprocess_image import recenter
    img, disc = synthetic_object_image()
    rgba = np.dstack([img, (disc * 255).astype(np.uint8)])
    out = recenter(rgba, 64, border_ratio=0.2)
    assert out.shape == (64, 64, 4)
    a = out[..., 3] > 127
    ys, xs = np.nonzero(a)
    cy, cx = ys.mean(), xs.mean()
    assert abs(cy - 32) < 3 and abs(cx - 32) < 3
    # object fills ~(1-border)² of the frame along its major axis
    assert (ys.max() - ys.min()) > 0.7 * 64 * 0.8


def test_normal_from_depth_unit_and_flat():
    from dreamfusion_tpu.preprocess_image import normal_from_depth
    flat = np.full((16, 16), 0.5, np.float32)
    n = normal_from_depth(flat)
    # flat depth → straight-on normals (0.5, 0.5, 1.0 encoded)
    np.testing.assert_allclose(n[..., 2], 1.0, atol=1e-5)
    ramp = np.tile(np.linspace(0, 1, 16, dtype=np.float32), (16, 1))
    n2 = normal_from_depth(ramp)
    dec = n2 * 2 - 1
    np.testing.assert_allclose(np.linalg.norm(dec, axis=-1), 1.0, atol=1e-5)
    assert (dec[..., 0] < 0).all()   # slope in +x → normal tilts -x


def test_cli_writes_rgba(tmp_path):
    from dreamfusion_tpu.preprocess_image import main
    img, _ = synthetic_object_image()
    p = str(tmp_path / "obj.png")
    Image.fromarray(img).save(p)
    rgba_path, depth_path, normal_path = main([p, "--size", "64"])
    assert rgba_path.endswith("_rgba.png")
    out = np.asarray(Image.open(rgba_path))
    assert out.shape == (64, 64, 4)
    assert depth_path is None and normal_path is None  # no DPT weights here

    # the produced rgba is loadable by the training-side reader
    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.training.image_data import load_ref_images
    cfg = finalize(Config(text=None, image=rgba_path,
                          workspace=str(tmp_path / "ws")))
    ref = load_ref_images(cfg, 32, 32)
    assert ref.rgb.shape[0] == 1 and ref.mask.any()


def test_run_omnidata_from_torch_ckpt(tmp_path):
    """End-to-end vendored-DPT path: a torch checkpoint in the omnidata
    layout (synthesized, tiny dims) is converted on the fly and produces a
    source-resolution depth map in [0,1]."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from dreamfusion_tpu.models.dpt import DPTConfig, DPTDepthModel
    from dreamfusion_tpu.preprocess_image import run_omnidata
    from dreamfusion_tpu.utils import convert as C

    cfg = DPTConfig(num_channels=1, vit_depth=2, resnet_depths=(1, 1, 1),
                    hooks=(0, 1))
    m = DPTDepthModel(cfg)
    t = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, 64, 64, 3))),
                       jax.random.PRNGKey(0))["params"]
    rng = np.random.default_rng(0)
    sd = {}
    for path, leaf in C._flax_paths(t):
        tk = C.dpt_mapper()(path)
        assert tk is not None, path
        shape = list(leaf.shape)
        if len(shape) == 4:
            shape = [shape[3], shape[2], shape[0], shape[1]]
        elif len(shape) == 2 and path.endswith("kernel"):
            shape = [shape[1], shape[0]]
        sd[tk] = 0.05 * rng.standard_normal(shape).astype(np.float32)
    ckpt = tmp_path / "omnidata_tiny.pt"
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in sd.items()}},
               str(ckpt))

    img, _ = synthetic_object_image(80)
    depth = run_omnidata(img, str(ckpt), task="depth", cfg=cfg, hw=64)
    assert depth.shape == (80, 80)
    assert np.isfinite(depth).all()
    assert depth.min() >= 0.0 and depth.max() <= 1.0
