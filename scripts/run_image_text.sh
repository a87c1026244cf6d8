#!/bin/bash
# image + text (SD + CLIP guidance; reference scripts/run_image_text.sh)
python -m dreamfusion_tpu.main -O --image data/hamburger_rgba.png \
    --text "a DSLR photo of a delicious hamburger" \
    --workspace trial_image_text --iters 5000 "$@"
