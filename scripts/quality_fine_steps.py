"""Quality sweep over the fine-march sample budget (grid_fine_steps).

Backs the perf decision to lower the flagship default from 96: the bench
curve measured 96 → 6.93 it/s, 64 → 8.46, 48 → 9.50 on the attached TPU
(Aug 17), and this sweep shows where converged reconstruction quality
starts paying for it.  Uses the convergence-benchmark recipe
(tests/test_convergence.fit) so the number is comparable with CI's bar.

    JAX_PLATFORMS=cpu python scripts/quality_fine_steps.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from dreamfusion_tpu.utils.platform import force_cpu  # noqa: E402

force_cpu()

from test_convergence import fit  # noqa: E402

if __name__ == "__main__":
    for fine in (96, 64, 48, 32, 24):
        p0, p1 = fit(probe_steps=32, fine_steps=fine)
        print(f"fine={fine:3d}: init {p0:5.2f} dB -> converged {p1:5.2f} dB",
              flush=True)
