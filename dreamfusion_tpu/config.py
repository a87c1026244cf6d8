"""Immutable experiment configuration.

TPU-first redesign of the reference's mutable argparse namespace
(/root/reference/main.py:22-169 and the conditional mutation logic at
main.py:172-306).  Instead of mutating a Namespace in place, we use a frozen
dataclass plus pure "preset" functions that return new configs; anything that
changes *during* training (progressive view ranges, progressive hash-grid
levels, ...) is expressed as an explicit schedule function of the step index
(see dreamfusion_tpu/training/schedules.py), never as config mutation.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, replace
from typing import Any, Optional, Sequence, Tuple


@dataclass(frozen=True)
class Config:
    # ---- workspace / run mode (reference main.py:26-61) ----
    text: Optional[str] = None
    negative: str = ""
    workspace: str = "workspace"
    seed: Optional[int] = None
    test: bool = False
    six_views: bool = False
    eval_interval: int = 1
    # epochs between rolling full checkpoints.  1 = reference parity
    # (save_checkpoint every epoch, utils.py:1090); long TPU runs raise it:
    # each save device_gets the full train state through the ~4 MB/s
    # tunnel, stealing download bandwidth from the training stream even
    # when async
    save_interval: int = 1
    test_interval: int = 100
    save_mesh: bool = False
    mcubes_resolution: int = 256
    decimate_target: int = 50000
    ckpt: str = "latest"

    # ---- guidance (main.py:43-56) ----
    guidance: Tuple[str, ...] = ("SD",)
    guidance_scale: float = 100.0
    # analytic target scene for `--guidance oracle` (guidance/oracle.py —
    # the zero-egress closed-form SDS prior; evaluation/analytic.SCENES)
    oracle_scene: str = "two_sphere"
    sd_version: str = "2.1"
    hf_key: Optional[str] = None
    # Local paths to converted flax / torch weights (zero-egress replacement for
    # the reference's HuggingFace downloads, sd_utils.py:34-49).
    pretrained_root: Optional[str] = None
    fp16: bool = True
    vram_O: bool = False
    t_range: Tuple[float, float] = (0.02, 0.98)

    # ---- image-conditioned mode (main.py:39-42) ----
    image: Optional[str] = None
    image_config: Optional[str] = None
    learned_embeds_path: Optional[str] = None
    known_view_interval: int = 4
    known_view_scale: float = 1.5
    known_view_noise_scale: float = 2e-3
    dmtet_reso_scale: float = 8.0
    bg_radius: float = 1.4

    # ---- training (main.py:57-84) ----
    iters: int = 10000
    lr: float = 1e-3
    ckpt_extra: Optional[str] = None
    max_steps: int = 1024          # grid-march sample budget per ray
    num_steps: int = 64            # vanilla: coarse samples
    upsample_steps: int = 32       # vanilla: importance samples
    update_extra_interval: int = 16
    max_ray_batch: int = 4096
    latent_iter_ratio: float = 0.2
    albedo_iter_ratio: float = 0.0
    min_ambient_ratio: float = 0.1
    textureless_ratio: float = 0.2
    jitter_pose: bool = False
    jitter_center: float = 0.2
    jitter_target: float = 0.2
    jitter_up: float = 0.02
    uniform_sphere_rate: float = 0.0
    grad_clip: float = -1.0
    grad_clip_rgb: float = -1.0

    # ---- model / rendering (main.py:85-112) ----
    backbone: str = "grid"         # grid | vanilla
    optim: str = "adan"            # adan | adam
    bound: float = 1.0
    dt_gamma: float = 0.0
    min_near: float = 0.01
    density_activation: str = "exp"   # exp (trunc_exp) | softplus
    density_thresh: float = 10.0
    blob_density: float = 5.0
    blob_radius: float = 0.2
    grid_size: int = 128
    # TPU-native renderer knobs (replaces the reference's dynamic two-pass
    # CUDA allocation, raymarching.py:197-256, with static sample budgets).
    # Defaults set by a measured speed/quality sweep on the convergence
    # benchmark (tests/test_convergence.py fit, scripts/quality_fine_steps.py
    # + /tmp probe sweep, Aug 17): converged PSNR by fine_steps
    # 96→64.7 64→61.2 48→60.8 32→59.6 24→59.2 dB, and by coarse probe
    # (G=128-equivalent) 128→59.6 64→60.1 32→60.2 16→57.8 8→15.2 dB —
    # the collapse is only below 16 probes; TPU it/s 6.9 (96/128) →
    # 11.5 (32/32) → 12.5 (24/32).  Round-3 sweep on BOTH convergence
    # targets: fine 24 vs 32 reads 58.6 vs 58.4 dB (sphere) and 55.2 vs
    # 57.3 dB (two-sphere hard scene) — −2 dB on the hard target at
    # PSNR levels far above SDS-generation fidelity, for +8.5% step rate.
    # coarse=24 was also probed: it REGRESSED it/s (12.1 vs 12.5; probe
    # shape 32 tiles better) — keep 32 probes.
    grid_coarse_steps: int = 32    # occupancy-probe samples per ray
    # network-evaluated samples per ray; importance-resampled into occupied
    # cells (so they concentrate where the reference's occupancy-marched
    # samples would land)
    grid_fine_steps: int = 24
    occupancy_mode: str = "resample"  # resample | mask

    # ---- network arch (reference nerf/network_grid.py:24-66, network.py:89-148) ----
    hidden_dim: int = 64
    num_layers: int = 3
    hidden_dim_bg: int = 32
    num_layers_bg: int = 2
    # hash grid — TPU-first re-tiling of the reference's L16×C2 budget
    # (gridencoder defaults, encoding.py:68-76): fewer, wider levels keep
    # the total feature count (32) and parameter budget while cutting the
    # gather/scatter ROW count per sample — rows, not bytes, price TPU
    # encoder lookups (CLAUDE.md gotcha 3), and per-row latency grows with
    # the gathered table's footprint (scripts/profile_grid_scan.py, r4:
    # encoder fwd+bwd at 131k pts — L16C2 282 ms, L8C4 194 ms, L4C8
    # 128 ms; fwd 58/53/15 ms — the L4C8 drop is also fewer hashed levels,
    # so a far smaller corner-packed table).  Quality at L4C8 holds:
    # 55.2 dB sphere / 58.3 dB two-sphere (vs 57.9/60.8 at L8C4) — a
    # ~-2.5 dB trade at PSNR levels far above SDS-generation fidelity,
    # for ~1.5× step rate.  Bitwise tcnn parity: --grid_levels 16
    # --grid_features_per_level 2 --grid_hash xor.
    grid_levels: int = 4
    grid_features_per_level: int = 8
    grid_log2_hashmap_size: int = 19
    grid_base_resolution: int = 16
    grid_desired_resolution: int = 2048
    grid_interpolation: str = "smoothstep"  # linear | smoothstep
    # hash combiner: affine (additive-congruential — TPU-first, 1 packed
    # gather row per sample/level, ops/hashgrid.py) | xor (tcnn parity)
    grid_hash: str = "affine"
    # triplane backbone (TPU-first encoder — see ops/triplane.py).
    # Single-scale 256² planes (EG3D configuration). Scale count drives the
    # gather/scatter row count; table size ALSO matters (512² measured 2×
    # slower than 256² — larger tables hurt scatter locality on this TPU)
    triplane_resolution: int = 256
    triplane_channels: int = 16
    triplane_scales: int = 1
    # 'autograd' | 'finite_difference' (reference network_grid.py:81-96)
    normal_mode: str = "autograd"
    use_tensorboard: bool = True   # scalars under workspace/run (utils.py:1080)
    # vanilla freq encoding (network.py:97-100)
    freq_multires: int = 6
    freq_multires_bg: int = 4

    # ---- camera / dataset (main.py:113-139) ----
    w: int = 64
    h: int = 64
    # eval/test render resolution (reference main.py:114-115 defaults
    # --H/--W 800): validation images, turntable videos and R-precision
    # inputs render at H×W, chunked through max_ray_batch; training renders
    # stay at h×w.
    H: int = 800
    W: int = 800
    dataset_size_train: int = 100
    dataset_size_valid: int = 8
    dataset_size_test: int = 100
    batch_size: int = 1
    radius_range: Tuple[float, float] = (3.0, 3.5)
    theta_range: Tuple[float, float] = (45.0, 105.0)
    phi_range: Tuple[float, float] = (-180.0, 180.0)
    fovy_range: Tuple[float, float] = (10.0, 30.0)
    default_radius: float = 3.2
    default_polar: float = 90.0
    default_azimuth: float = 0.0
    default_fovy: float = 20.0
    # GUI light direction (spherical degrees; reference main.py:122-123
    # --light_theta/--light_phi feed the DearPyGui lambertian preview — here
    # they drive viewer.py's non-albedo shading light). light_theta is the
    # POLAR/inclination angle (reference help: [0,180] ~ elevation [90,-90]).
    light_theta: float = 60.0
    light_phi: float = 0.0
    progressive_view: bool = False
    progressive_view_init_ratio: float = 0.2
    progressive_level: bool = False
    angle_overhead: float = 30.0
    angle_front: float = 60.0
    t5_iters: int = -1
    dont_override_stuff: bool = False

    # ---- lambdas (main.py:140-158) ----
    lambda_entropy: float = 1e-3
    lambda_opacity: float = 0.0
    lambda_orient: float = 1e-2
    lambda_tv: float = 0.0
    lambda_wd: float = 0.0
    lambda_mesh_normal: float = 0.5
    lambda_mesh_laplacian: float = 0.5
    lambda_guidance: float = 1.0
    lambda_rgb: float = 1000.0
    lambda_mask: float = 500.0
    lambda_normal: float = 0.0
    lambda_depth: float = 10.0
    lambda_2d_normal_smooth: float = 0.0
    lambda_3d_normal_smooth: float = 0.0
    lambda_clip: float = 1.0

    # ---- perpneg (main.py:36-38, nerf/utils.py:60-100) ----
    perpneg: bool = False
    negative_w: float = -2.0
    front_decay_factor: float = 2.0
    side_decay_factor: float = 10.0

    # ---- DMTet stage (main.py:100-107) ----
    dmtet: bool = False
    tet_grid_size: int = 128
    init_with: str = ""
    lock_geo: bool = False

    # ---- zero123 (main.py:159-163) ----
    zero123_config: Optional[str] = None
    zero123_ckpt: Optional[str] = None
    zero123_grad_scale: str = "angle"   # angle | None

    # ---- misc / infra ----
    ema_decay: float = 0.95
    max_keep_ckpt: int = 2
    # score text-only validation renders with a CLIP tower when one is
    # available (pretrained clip.npz, an active clip guidance, or tiny
    # smoke towers) so `--ckpt best` is best-by-metric even without ground
    # truth; the reference falls back to best==latest there
    # (nerf/utils.py:1236-1264)
    clip_eval: bool = True
    save_guidance: bool = False
    save_guidance_interval: int = 10
    exp_start_iter: Optional[int] = None
    exp_end_iter: Optional[int] = None

    # ---- TPU parallelism (replaces the dormant DDP path, nerf/utils.py:248-250) ----
    mesh_shape: Tuple[int, ...] = (1,)          # device mesh, e.g. (8,) or (4, 2)
    mesh_axes: Tuple[str, ...] = ("data",)      # axis names matching mesh_shape
    shard_views: bool = True                    # data-parallel over rendered views
    fsdp_guidance: bool = False   # ZeRO-3-shard the frozen guidance towers
    tp_guidance: bool = True      # Megatron-shard UNet attention/FF over a
                                  # 'model' mesh axis when one exists
    sp_rays: bool = True          # shard the flattened ray dim over the
                                  # whole mesh (sequence-parallel render)
    split_step: bool = False      # 3 jitted programs (render fwd / guidance
                                  # grad / render bwd+update) instead of the
                                  # fused step: slower steady-state, but
                                  # render-knob changes skip the big
                                  # guidance cold compile
    merge_phases: bool = False    # ONE executable for the normal-as-latent
                                  # warmup AND the main phase (traced
                                  # lax.cond on the warmup predicate) when
                                  # guidance is SD-only.  Measured NET
                                  # LOSS at 10k steps: the cond around the
                                  # latents path costs ~20% steady-state
                                  # (10.0 vs 12.56 it/s A/B, bench.py
                                  # --merge ≈ +200 s/10k) while saving
                                  # only ~60-120 s of per-program
                                  # first-execution tax — kept as a knob
                                  # for short runs (< ~3k steps) where the
                                  # trade flips
    scan_blocks: bool = False     # dispatch lax.scan blocks of
                                  # dataset_size_train steps instead of
                                  # per-step programs.  Measured DEAD END
                                  # on the tunnel backend (RUN_r03_cold:
                                  # ~90 ms/step in-scan vs ~80 ms
                                  # pipelined per-step — the per-step
                                  # dispatch cost is overlapped, and the
                                  # scan serializes async-save device
                                  # reads behind 8 s blocks); kept for
                                  # direct-attached-TPU hosts

    # ---- precision ----
    compute_dtype: str = "bfloat16"   # activations in bf16, params fp32
    # ------------------------------------------------------------------

    @property
    def cascade(self) -> int:
        import math
        return 1 + max(0, int(math.ceil(math.log2(max(self.bound, 1.0)))))

    @property
    def default_zero123_w(self) -> float:
        return 1.0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(Config)}
        d = {k: (tuple(v) if isinstance(v, list) else v) for k, v in d.items() if k in known}
        return Config(**d)


# ---------------------------------------------------------------------------
# Preset expansion — pure functions mirroring the reference's in-place flag
# overrides (main.py:170-306) but returning new Config objects.
# ---------------------------------------------------------------------------

def apply_O(cfg: Config) -> Config:
    """`-O`: fp16 + grid backbone with occupancy-accelerated marching
    (reference main.py:172-174 sets fp16 + cuda_ray; our grid renderer is the
    TPU equivalent of cuda_ray)."""
    return replace(cfg, fp16=True, backbone="grid")


def apply_O2(cfg: Config) -> Config:
    """`-O2`: fp16 + vanilla backbone + progressive level (main.py:176-179)."""
    return replace(cfg, fp16=True, backbone="vanilla", progressive_level=True)


def apply_IF(cfg: Config) -> Config:
    """`--IF`: swap SD guidance for DeepFloyd-IF (main.py:181-185)."""
    guidance = tuple("IF" if g == "SD" else g for g in cfg.guidance)
    return replace(cfg, guidance=guidance, latent_iter_ratio=0.0)


def apply_image_mode(cfg: Config) -> Config:
    """Image-only conditioning → zero123 guidance (main.py:196-232).
    An explicit oracle guidance (`--guidance image_oracle` with
    `--image analytic:<scene>` — the zero-egress quality run) is kept."""
    gd = cfg.guidance if any("oracle" in g for g in cfg.guidance) \
        else ("zero123",)
    if cfg.dont_override_stuff:
        return replace(cfg, guidance=gd)
    return replace(
        cfg,
        guidance=gd,
        fovy_range=(cfg.default_fovy, cfg.default_fovy),
        guidance_scale=5.0,
        lambda_3d_normal_smooth=10.0,
        lambda_entropy=1.0,
        lambda_orient=1.0,
        latent_iter_ratio=0.0,
        progressive_view=True,
        progressive_level=True,
    )


def apply_image_text_mode(cfg: Config) -> Config:
    """Image + text → SD + CLIP guidance (main.py:203-212)."""
    out = replace(
        cfg,
        guidance=("SD", "clip"),
        bg_radius=-1.0,
    )
    if cfg.dont_override_stuff:
        return out
    return replace(
        out,
        guidance_scale=10.0,
        t_range=(0.2, 0.6),
        known_view_interval=2,
        lambda_3d_normal_smooth=20.0,
    )


def apply_dmtet(cfg: Config) -> Config:
    """DMTet refinement stage overrides (main.py:253-274)."""
    h = int(cfg.h * cfg.dmtet_reso_scale)
    w = int(cfg.w * cfg.dmtet_reso_scale)
    out = replace(cfg, dmtet=True, h=h, w=w)
    if cfg.dont_override_stuff:
        return out
    out = replace(
        out,
        t_range=(0.02, 0.5),
        latent_iter_ratio=0.0,
        albedo_iter_ratio=0.0,
        progressive_view=False,
    )
    if cfg.image is not None:
        out = replace(out, known_view_scale=1.0)
    return out


def finalize(cfg: Config) -> Config:
    """Final derived-value fixups applied once after all presets."""
    if cfg.backbone in ("grid_taichi", "grid_tcnn"):
        # the reference's alternative CUDA/Taichi hash-grid backends
        # (main.py:289-306) are one implementation here
        cfg = replace(cfg, backbone="grid")
    if "oracle" in cfg.guidance or "image_oracle" in cfg.guidance:
        # the pixel-space oracle prior consumes rgb, not normal-as-latent
        # warmup images (training/trainer.py _guidance_loss); bg_radius=-1
        # keeps eval/test renders on the same white background as the
        # analytic target so the oracle PSNR eval metric is meaningful;
        # albedo_iter_ratio=1 disables the random lambertian/textureless
        # shading draws — the analytic target has no lighting model, so a
        # shaded render would chase it with an inconsistent gradient
        cfg = replace(cfg, latent_iter_ratio=0.0, bg_radius=-1.0,
                      albedo_iter_ratio=1.0)
    exp_start = cfg.exp_start_iter if cfg.exp_start_iter is not None else 0
    exp_end = cfg.exp_end_iter if cfg.exp_end_iter is not None else cfg.iters
    return replace(cfg, exp_start_iter=exp_start, exp_end_iter=exp_end)


def load_config_json(path: str) -> Config:
    """Rebuild a Config from a workspace `config.json` (persisted by
    Trainer.__init__ — already finalized).  Unknown/legacy keys are
    ignored; lists coerce back to tuples.  Single source of truth for
    every consumer that needs a checkpoint-compatible config (viewer,
    scripts/probe_export_cost) — a hand-maintained field subset silently
    goes stale whenever a tree-shaping field is added (ADVICE r5)."""
    import json as _json
    with open(path) as f:
        raw = _json.load(f)
    defaults = Config()
    kw = {}
    for k, v in raw.items():
        if not hasattr(defaults, k):
            continue
        dv = getattr(defaults, k)
        if isinstance(dv, tuple) and isinstance(v, list):
            v = tuple(v)
        kw[k] = v
    return Config(**kw)
