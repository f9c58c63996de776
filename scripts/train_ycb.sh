#!/usr/bin/env bash
# YCB-Video launch (version/transparent/scripts/train_ycb.sh equivalent).
set -euo pipefail
python -m pose_estimation_tpu.cli \
    --config transparent_cleargrasp \
    --dataset ycb \
    --dataset_root "${YCB_ROOT:-data/ycbv}" \
    --log_file "${LOG_DIR:-runs/ycb}" \
    "$@"
