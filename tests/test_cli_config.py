"""CLI flag surface: preset expansion, args-file splicing, mode overrides,
multi-view CSV config (reference main.py:172-306 behavioral contract)."""

import numpy as np
import pytest
from PIL import Image

from dreamfusion_tpu.main import build_parser, config_from_args


def parse(argv):
    return config_from_args(build_parser().parse_args(argv))


def test_O_preset():
    cfg = parse(["-O", "--text", "a hamburger"])
    assert cfg.fp16 and cfg.backbone == "grid"
    assert cfg.guidance == ("SD",)


def test_O2_preset():
    cfg = parse(["-O2", "--text", "a hamburger"])
    assert cfg.fp16 and cfg.backbone == "vanilla"
    assert cfg.progressive_level


def test_IF_swap():
    cfg = parse(["-O", "--IF", "--text", "x"])
    assert cfg.guidance == ("IF",)
    assert cfg.latent_iter_ratio == 0.0      # main.py:181-185


def test_image_mode_overrides(tmp_path):
    p = str(tmp_path / "x_rgba.png")
    Image.fromarray(np.zeros((8, 8, 4), np.uint8)).save(p)
    cfg = parse(["--image", p])
    assert cfg.guidance == ("zero123",)
    assert cfg.guidance_scale == 5.0
    assert cfg.latent_iter_ratio == 0.0
    assert cfg.progressive_view


def test_image_text_mode(tmp_path):
    p = str(tmp_path / "x_rgba.png")
    Image.fromarray(np.zeros((8, 8, 4), np.uint8)).save(p)
    cfg = parse(["--image", p, "--text", "a corgi"])
    assert set(cfg.guidance) == {"SD", "clip"}
    assert cfg.guidance_scale == 10.0
    assert cfg.t_range == (0.2, 0.6)


def test_dmtet_overrides():
    cfg = parse(["--text", "x", "--dmtet", "--w", "64", "--h", "64"])
    assert cfg.dmtet
    assert cfg.h == 64 * 8 and cfg.w == 64 * 8   # dmtet_reso_scale
    assert cfg.t_range == (0.02, 0.5)
    assert not cfg.progressive_view


def test_args_file_splicing(tmp_path):
    f = tmp_path / "res.args"
    f.write_text("--w\n32\n--h\n24\n")
    cfg = parse(["--text", "x", "--file", str(f)])
    assert (cfg.w, cfg.h) == (32, 24)


def test_backbone_aliases():
    assert parse(["--text", "x", "--backbone", "grid_taichi"]).backbone == "grid"
    assert parse(["--text", "x", "--backbone", "grid_tcnn"]).backbone == "grid"


def test_image_config_csv_multiview(tmp_path):
    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.training.image_data import load_ref_images

    imgs = []
    for i in range(2):
        p = str(tmp_path / f"v{i}_rgba.png")
        a = np.zeros((16, 16, 4), np.uint8)
        a[4:12, 4:12] = (100 + 50 * i, 50, 50, 255)
        Image.fromarray(a).save(p)
        imgs.append(p)
    csvp = tmp_path / "views.csv"
    csvp.write_text(
        "image,polar,azimuth,radius,zero123_weight\n"
        f"{imgs[0]},90,0,3.2,1.0\n"
        f"{imgs[1]},90,180,3.2,0.5\n")
    cfg = finalize(Config(image_config=str(csvp),
                          workspace=str(tmp_path / "ws"),
                          known_view_scale=1.0))
    ref = load_ref_images(cfg, 16, 16)
    assert ref.rgb.shape[0] == 2
    assert list(ref.azimuths) == [0.0, 180.0]
    assert list(ref.weights) == [1.0, 0.5]
    assert ref.mask[0].any()


def test_reference_format_csv_with_spaces(tmp_path):
    """The reference's config/*.csv have spaces after commas (and in the
    header); the parser must accept them verbatim."""
    from dreamfusion_tpu.training.image_data import parse_image_config
    p = tmp_path / "v.csv"
    p.write_text("zero123_weight, radius, polar, azimuth, image\n"
                 "1, 3, 90, 0, data/front_rgba.png\n")
    rows = parse_image_config(str(p))
    assert rows[0]["image"] == "data/front_rgba.png"
    assert float(rows[0]["polar"]) == 90.0
    assert float(rows[0]["zero123_weight"]) == 1.0


def test_reference_compat_flags():
    """Every reference-only flag is accepted: --cuda_ray/--taichi_ray/
    --max_spp are documented no-ops, --radius/--fovy alias the default_*
    camera fields, --light_theta/--light_phi are real config fields
    (reference main.py:96-124, 155-156)."""
    cfg = parse(["--text", "x", "--cuda_ray", "--taichi_ray",
                 "--max_spp", "4", "--radius", "4.5", "--fovy", "30",
                 "--light_theta", "45", "--light_phi", "10"])
    assert cfg.default_radius == 4.5
    assert cfg.default_fovy == 30.0
    assert cfg.light_theta == 45.0 and cfg.light_phi == 10.0


def test_full_reference_flag_surface():
    """Parse the reference's entire argparse flag inventory (scraped from
    its main.py when present) — a user's reference command line must not
    crash here."""
    import os
    import re
    ref = "/root/reference/main.py"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not present")
    with open(ref) as f:
        src = f.read()
    # both quote styles + any case; capture whether the flag is store_true
    # so we can pass it BARE, exactly as a reference command line would
    calls = re.findall(
        r"add_argument\((['\"])(--[A-Za-z_0-9]+)\1([^)]*)", src)
    flags = [(flag, "store_true" in rest) for _, flag, rest in calls]
    assert len(flags) >= 100, (
        f"scrape canary: only {len(flags)} flags scraped from the reference "
        "(expected its full ~114-flag inventory); regex drift?")
    parser = build_parser()
    defaults = parse(["--text", "x"])
    argv = ["--text", "x"]
    import dataclasses
    from dreamfusion_tpu.config import Config
    fields = {f.name: f for f in dataclasses.fields(Config)}
    for flag, bare in flags:
        name = flag[2:]
        if name in ("file", "image", "image_config", "init_with"):
            continue  # need real files; covered by dedicated tests above
        if bare:
            argv += [flag]  # reference store_true flags consume no value
            continue
        f = fields.get(name)
        if f is None:
            argv += [flag, "1"]
            continue
        v = getattr(defaults, name)
        if isinstance(v, tuple):
            argv += [flag] + [str(x) for x in v]
        elif isinstance(v, bool):
            argv += [flag, "true"]
        else:
            argv += [flag, str(v) if v is not None else "1"]
    cfg = config_from_args(parser.parse_args(argv))
    assert cfg.text == "x"
    # bare store_true booleans that map onto auto-generated value-form
    # flags must land as True (the ADVICE round-2 finding)
    assert cfg.fp16 and cfg.jitter_pose and cfg.progressive_view
    assert cfg.progressive_level and cfg.save_guidance


def test_oracle_guidance_preset():
    """`--guidance oracle` (the zero-egress quality prior, guidance/
    oracle.py): finalize pins latent warmup off, white eval background and
    albedo-only shading so the analytic target is chaseable/measurable."""
    cfg = parse(["--guidance", "oracle", "--oracle_scene", "sphere"])
    assert cfg.guidance == ("oracle",)
    assert cfg.oracle_scene == "sphere"
    assert cfg.latent_iter_ratio == 0.0
    assert cfg.bg_radius == -1.0
    assert cfg.albedo_iter_ratio == 1.0

    from dreamfusion_tpu.main import build_guidance
    g, gp, emb = build_guidance(cfg, tiny=True)
    assert gp["oracle"] == {}          # stateless prior
    assert g["oracle"].scene == "sphere"


def test_none_default_int_flags_parse_typed():
    """Optional[int]/Optional[float] config fields (seed, max_spp, ...)
    must parse as numbers, not strings — a str seed crashes
    np.random.seed at run start (round-3 regression)."""
    from dreamfusion_tpu.main import build_parser, config_from_args
    args = build_parser().parse_args(
        ["--text", "x", "--seed", "3", "--exp_start_iter", "10"])
    cfg = config_from_args(args)
    assert cfg.seed == 3 and isinstance(cfg.seed, int)
    assert cfg.exp_start_iter == 10 and isinstance(cfg.exp_start_iter, int)


def test_every_guidance_branch_routes_pretrained_root(tmp_path, monkeypatch):
    """main.build_guidance must call load_pretrained for EVERY guidance
    kind when --pretrained_root is set (VERDICT r3 #4: the zero123 and clip
    branches previously always init_params'd, making converted weights
    unreachable from the CLI; reference loads the zero123 ckpt at
    guidance/zero123_utils.py:22-54)."""
    import numpy as np
    from dataclasses import replace

    from dreamfusion_tpu.config import Config, finalize
    from dreamfusion_tpu.main import build_guidance

    class Reached(Exception):
        pass

    def raising(self, root):
        assert root == str(tmp_path)
        raise Reached()

    from dreamfusion_tpu.guidance import clip as clip_mod
    from dreamfusion_tpu.guidance import deepfloyd as if_mod
    from dreamfusion_tpu.guidance import sd as sd_mod
    from dreamfusion_tpu.guidance import zero123 as z_mod

    monkeypatch.setattr(sd_mod.StableDiffusionGuidance, "load_pretrained",
                        raising)
    monkeypatch.setattr(if_mod.IFGuidance, "load_pretrained", raising)
    monkeypatch.setattr(z_mod.Zero123Guidance, "load_pretrained", raising)
    monkeypatch.setattr(clip_mod.CLIPGuidance, "load_pretrained", raising)

    class FakeRef:
        rgb = np.zeros((1, 8, 8, 3), np.float32)
        polars = np.array([90.0])
        azimuths = np.array([0.0])
        radii = np.array([3.2])
        weights = np.array([1.0])

    for name in ("SD", "IF", "zero123", "clip"):
        cfg = finalize(replace(Config(), text="x",
                               guidance=(name,),
                               pretrained_root=str(tmp_path)))
        with pytest.raises(Reached):
            build_guidance(cfg, tiny=False,
                           ref_images=FakeRef() if name == "zero123"
                           else None)
