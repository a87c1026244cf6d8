#!/bin/bash
# image-to-3D via zero123 (reference scripts/run_image.sh);
# preprocess first: python -m dreamfusion_tpu.preprocess_image img.png
python -m dreamfusion_tpu.main -O --image data/hamburger_rgba.png \
    --workspace trial_image --iters 5000 "$@"
