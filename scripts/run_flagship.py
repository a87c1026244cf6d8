"""Full-length flagship run on the TPU → RUN_r0N.json (VERDICT r2 #1, r3 #1).

Drives the real CLI (python -m dreamfusion_tpu.main) for a 10k-iteration
text-to-3D run at the flagship configuration — latent warmup, occupancy
grid updates, epoch evals at the reference's 800² eval resolution, async
rolling checkpoints, final turntable video + mesh export — and writes a
machine-readable wall-clock breakdown next to the repo root.

The north star (BASELINE.md): 10k steps ≤ 15 min wall-clock.  Every phase
is timed so whatever the total is, it is attributable: steps vs compile
vs evals vs saves vs the final test/export (which the reference also runs
in the same command, reference main.py:368-376).

Run: python scripts/run_flagship.py [--iters 10000] [--out RUN_r03.json]
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--workspace", default="/root/runs/r5_flagship")
    ap.add_argument("--out", default=os.path.join(ROOT, "RUN_r05.json"))
    ap.add_argument("--eval_interval", type=int, default=25,
                    help="epochs between 800² evals (25 → 4 evals over a "
                         "10k run; a healthy-field 4-view 800² eval costs "
                         "~4.7 s on this chip, but a DEGENERATE field — "
                         "random-weight SD saturates the occupancy grid — "
                         "costs ~33 s/eval (RUN_r04's eval phase), so the "
                         "random-prior timing run keeps the count low)")
    ap.add_argument("--save_interval", type=int, default=25,
                    help="epochs between rolling checkpoints: each save "
                         "device_gets the full train state through the "
                         "~4 MB/s tunnel and steals download bandwidth "
                         "from the training stream even when async")
    ap.add_argument("--test_frames", type=int, default=50,
                    help="turntable frames for the final test video: the "
                         "reference default 100 at 800² costs ~240 s of "
                         "render+download on this chip (RUN_r03 "
                         "test_video); 50 halves that with no loss of "
                         "demonstrative value")
    ap.add_argument("--text", default="a DSLR photo of a delicious "
                    "hamburger")
    ap.add_argument("--oracle", action="store_true",
                    help="run the closed-form oracle prior instead of SD "
                         "(guidance/oracle.py): the run CONVERGES to real "
                         "geometry in this zero-egress environment, so the "
                         "video/mesh artifacts and the analytic-PSNR eval "
                         "metric demonstrate end-to-end quality.  The SD "
                         "run stays the TIMING artifact (its step carries "
                         "the full UNet+VAE guidance cost); the oracle run "
                         "is the QUALITY artifact.")
    ap.add_argument("--oracle_scene", default="two_sphere")
    ap.add_argument("--init_with", default="",
                    help="stage-1 checkpoint dir (or mesh file) for "
                         "--mode dmtet_oracle")
    ap.add_argument("--mode", default="sd",
                    choices=["sd", "if", "perpneg", "image_oracle",
                             "dmtet_oracle"],
                    help="sd = SD 2.1 flagship; if = DeepFloyd-IF prior "
                         "(--IF preset, pixel-space 4.2B UNet); perpneg = "
                         "SD + Perp-Neg view conditioning; image_oracle = "
                         "image-conditioned run against the analytic "
                         "scene (known-view RGBD + pose-delta SDS) — the "
                         "zero-egress image-pipeline quality artifact")
    args = ap.parse_args()
    # every non-sd mode gets its own default artifact + workspace — the
    # shared defaults would silently overwrite the committed SD flagship
    # artifact and could read a stale df.meta.json from a previous run
    # (ADVICE r5 self-review)
    suffix = "oracle" if args.oracle else (
        args.mode if args.mode != "sd" else None)
    if suffix:
        if args.out == os.path.join(ROOT, "RUN_r05.json"):
            args.out = os.path.join(ROOT, f"RUN_r05_{suffix}.json")
        if args.workspace == "/root/runs/r5_flagship":
            args.workspace = f"/root/runs/r5_{suffix}"

    cmd = [
        sys.executable, "-m", "dreamfusion_tpu.main",
        "--iters", str(args.iters),
        "--workspace", args.workspace,
        "--backbone", "triplane",
        "--seed", "0",
        "--lambda_3d_normal_smooth", "0",
        "--eval_interval", str(args.eval_interval),
        "--save_interval", str(args.save_interval),
        "--ckpt", "scratch",
        "--dataset_size_test", str(args.test_frames),
        "--save_mesh",
    ]
    if args.oracle:
        # lr 1e-2: the oracle prior's converged recipe (swept in
        # tests/test_sds_convergence.py — 9.1→27.9 dB at 240 tiny steps)
        cmd += ["--guidance", "oracle", "--oracle_scene", args.oracle_scene,
                "--guidance_scale", "1.0", "--lr", "0.01"]
    elif args.mode == "if":
        cmd += ["--text", args.text, "--IF", "--fp16", "true"]
    elif args.mode == "perpneg":
        cmd += ["--text", args.text, "--perpneg", "--fp16", "true"]
    elif args.mode == "image_oracle":
        cmd += ["--image", f"analytic:{args.oracle_scene}",
                "--guidance", "image_oracle",
                "--guidance_scale", "1.0", "--lr", "0.01"]
    elif args.mode == "dmtet_oracle":
        # stage-2 refinement of a CONVERGED stage-1 field against the
        # same analytic scene — the reference's two-stage pipeline
        # (main.py:317-329) end to end with a converging prior
        assert args.init_with, "--mode dmtet_oracle needs --init_with"
        cmd += ["--dmtet", "--init_with", args.init_with,
                "--guidance", "oracle", "--oracle_scene", args.oracle_scene,
                "--guidance_scale", "1.0", "--lr", "0.002"]
    else:
        cmd += ["--text", args.text]
    print("[run_flagship]", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT)
    total = time.time() - t0

    stats = {}
    rs = os.path.join(args.workspace, "run_stats.json")
    if os.path.exists(rs):
        with open(rs) as f:
            stats = json.load(f)

    results_dir = os.path.join(args.workspace, "results")
    mesh_dir = os.path.join(args.workspace, "mesh")
    artifacts = {
        "video": sorted(os.listdir(results_dir))
        if os.path.isdir(results_dir) else [],
        "mesh": sorted(os.listdir(mesh_dir))
        if os.path.isdir(mesh_dir) else [],
    }
    train_wall = stats.get("train_wall", 0.0)
    has_mp4 = any(f.endswith((".mp4", ".avi")) for f in artifacts["video"])
    has_mesh = any(f.endswith(".obj") for f in artifacts["mesh"])
    # One-time per-process startup tax, measured and attributed: with a
    # fully WARM persistent cache (dispatch 25.9 s) the first fused-step
    # fence still took 744.6 s (r4 flagship log) — a device/tunnel-side
    # first-execution cost that neither pre-warming nor the cache removes,
    # and that the r3/r4-old runs smeared across "fence_wait_in_steps"
    # (630 s) instead.  It is environment (axon tunnel), not step compute:
    # the same step executes at ~75 ms steady two epochs later.  Report
    # train wall both raw and ex-startup so the steady-state claim is
    # auditable against the north star.
    # trainer-written attribution (single source of truth; ADVICE r4).
    # When run_stats.json is missing there is NO timing data: every
    # derived wall/startup field and both north-star booleans must be
    # null, not vacuously-true zeros (ADVICE r4).
    startup = stats.get("startup_s",
                        stats.get("first_iter_dispatch", 0.0) +
                        stats.get("first_iter_fence", 0.0))
    train_ex_startup = max(train_wall - startup, 0.0)
    have_stats = bool(stats)
    out = {
        "iters": args.iters,
        "returncode": proc.returncode,
        "total_wall_s": round(total, 1),
        "train_wall_s": round(train_wall, 1) if have_stats else None,
        "train_wall_min": round(train_wall / 60.0, 2) if have_stats
        else None,
        "post_train_s": round(total - train_wall, 1) if have_stats
        else None,
        "phases": {k: round(v, 1) for k, v in stats.items()
                   if isinstance(v, (int, float))},
        "startup_s": round(startup, 1) if have_stats else None,
        "train_wall_ex_startup_min": round(train_ex_startup / 60.0, 2)
        if have_stats else None,
        "north_star_min": 15.0,
        "beats_north_star": bool(train_wall <= 15 * 60 and
                                 proc.returncode == 0) if have_stats
        else None,
        "beats_north_star_ex_startup": bool(
            train_ex_startup <= 15 * 60 and proc.returncode == 0)
        if have_stats else None,
        "has_video_container": has_mp4,
        "has_mesh_obj": has_mesh,
        "eval_interval_epochs": args.eval_interval,
        "artifacts": artifacts,
        "text": None if (args.oracle or "oracle" in args.mode)
        else args.text,
        "guidance": "oracle" if args.oracle else args.mode.upper(),
    }
    if args.mode == "image_oracle":
        # known-view masked PSNR of the best checkpoint (the
        # image-conditioned eval metric, trainer.evaluate)
        meta = os.path.join(args.workspace, "checkpoints", "df.meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                out["known_view_psnr_db"] = json.load(f).get("best_result")
    if args.oracle:
        out["oracle_scene"] = args.oracle_scene
        # final analytic-PSNR eval metric (trainer._oracle_eval_metric),
        # recorded by the best-checkpoint bookkeeping
        meta = os.path.join(args.workspace, "checkpoints", "df.meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                out["oracle_psnr_db"] = json.load(f).get("best_result")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
