#!/bin/bash
# stage 2: DMTet refinement from a stage-1 checkpoint (reference run*_dmtet)
python -m dreamfusion_tpu.main -O --text "a hamburger" --dmtet \
    --init_with trial_hamburger/checkpoints \
    --workspace trial_hamburger_dmtet --iters 5000 "$@"
