#!/bin/bash
# text-to-3D, flagship config (mirrors reference scripts/run.sh)
python -m dreamfusion_tpu.main -O --text "a hamburger" \
    --workspace trial_hamburger --iters 5000 "$@"
