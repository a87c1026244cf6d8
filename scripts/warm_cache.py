"""Pre-seed the persistent XLA compile cache for the flagship config.

The fused train step compiles in ~5-20 min cold through the TPU compile
relay (CLAUDE.md gotcha 6); the package-level persistent cache
(~/.cache/dftpu_xla, override with DFTPU_COMPILE_CACHE) makes warm runs
instant.  Run this once after changing any compile-relevant config knob
(resolution, backbone, fine steps) so interactive runs and the driver's
bench hit a warm cache:

    python scripts/warm_cache.py [--backbone triplane] [--fine 0] [--hw 64]

It compiles + executes ONE fused train step and one density-grid update —
exactly the programs bench.py and main.py train with.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser("warm_cache")
    ap.add_argument("--backbone", default="triplane")
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--fine", type=int, default=0)
    ap.add_argument("--scales", type=int, default=0)
    args = ap.parse_args()

    from bench import run_bench
    t = time.time()
    run_bench(steps=1, render_hw=args.hw, backbone=args.backbone,
              fine_steps=args.fine, triplane_scales=args.scales)
    print(f"[warm_cache] compiled + 1 step in {time.time() - t:.1f}s "
          f"(cache: {os.environ.get('DFTPU_COMPILE_CACHE', '~/.cache/dftpu_xla')})")


if __name__ == "__main__":
    main()
