"""Web viewer HTTP round-trip + standalone guidance sampler CLIs."""

import io
import json
import os
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    import jax

    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.training.trainer import Trainer
    from dreamfusion_tpu.viewer import ViewerState, make_handler

    tmp = tmp_path_factory.mktemp("viewer")
    cfg = finalize(Config(
        text="x", workspace=str(tmp / "ws"), backbone="vanilla",
        w=16, h=16, num_steps=12, upsample_steps=0, hidden_dim=16,
        num_layers=2, hidden_dim_bg=8, num_layers_bg=2, fp16=False, seed=0))
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    vs = ViewerState(tr, state)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(vs, False))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_viewer_page_caps_render(served):
    page = urllib.request.urlopen(served + "/").read().decode()
    assert "<canvas" in page
    caps = json.loads(urllib.request.urlopen(served + "/caps").read())
    assert caps == {"train": False}
    img_bytes = urllib.request.urlopen(
        served + "/render?polar=80&azimuth=30&radius=3.2&size=32").read()
    img = Image.open(io.BytesIO(img_bytes))
    assert img.size == (32, 32)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    # two different azimuths give different renders
    img2 = Image.open(io.BytesIO(urllib.request.urlopen(
        served + "/render?polar=80&azimuth=120&radius=3.2&size=32").read()))
    assert not np.array_equal(np.asarray(img), np.asarray(img2))


def test_sd_txt2img_cli(tmp_path):
    from dreamfusion_tpu.guidance.sd import _main
    out = str(tmp_path / "sd.png")
    _main(["a hamburger", "--tiny", "--steps", "2", "--out", out])
    im = np.asarray(Image.open(out))
    assert im.shape[-1] == 3 and np.isfinite(im).all()


def test_zero123_novel_view_cli(tmp_path):
    from dreamfusion_tpu.guidance.zero123 import _main
    ref = np.full((32, 32, 4), 255, np.uint8)
    ref[8:24, 8:24, :3] = (200, 60, 60)
    p = str(tmp_path / "ref.png")
    Image.fromarray(ref).save(p)
    out = str(tmp_path / "nv.png")
    _main(["--image", p, "--tiny", "--steps", "2", "--azimuth", "40",
           "--out", out])
    assert os.path.exists(out)
