#!/bin/bash
# IF + Perp-Neg multi-view prompting (reference scripts/run_if2_perpneg.sh)
python -m dreamfusion_tpu.main -O --IF --perpneg --text "a tiger" \
    --workspace trial_perpneg_tiger --iters 5000 "$@"
