#!/bin/bash
# DeepFloyd-IF guidance (mirrors reference scripts/run_if.sh)
python -m dreamfusion_tpu.main -O --IF --text "a hamburger" \
    --workspace trial_if_hamburger --iters 5000 "$@"
