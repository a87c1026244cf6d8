"""Backbone quality comparison at a fixed step budget (VERDICT r2 #9).

Runs the convergence-benchmark fit (tests/test_convergence.py) for every
field backbone — triplane (flagship), grid-affine (TPU-first hash),
grid-xor (tcnn parity), vanilla (freq encoding) — on both analytic targets
(single sphere; two occluding textured spheres) and prints a markdown
table of converged PSNR.  Committed to README as the cross-backbone
quality guard.

Run: python scripts/backbone_table.py [--steps 400] [--scene both]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_convergence import fit  # noqa: E402

BACKBONES = [
    ("triplane", {}),
    ("grid", {"grid_hash": "affine"}),
    ("grid", {"grid_hash": "xor"}),
    ("vanilla", {}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--scene", default="both",
                    choices=["sphere", "two_sphere", "both"])
    args = ap.parse_args()
    scenes = ["sphere", "two_sphere"] if args.scene == "both" \
        else [args.scene]

    rows = []
    for backbone, kw in BACKBONES:
        label = backbone if backbone != "grid" else \
            f"grid-{kw['grid_hash']}"
        psnrs = {}
        for scene in scenes:
            t = time.time()
            _, psnr = fit(steps=args.steps, backbone=backbone,
                          scene=scene, **kw)
            psnrs[scene] = psnr
            print(f"[{label} / {scene}] {psnr:.2f} dB "
                  f"({time.time() - t:.0f}s)", flush=True)
        rows.append((label, psnrs))

    print(f"\n| backbone | " + " | ".join(scenes) + " |")
    print("|---|" + "---|" * len(scenes))
    for label, psnrs in rows:
        cells = " | ".join(f"{psnrs[s]:.1f} dB" for s in scenes)
        print(f"| {label} | {cells} |")


if __name__ == "__main__":
    main()
