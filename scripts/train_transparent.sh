#!/usr/bin/env bash
# Cleargrasp transparent-pipeline launch
# (version/transparent/scripts/train_transparent.sh equivalent; the
# reference's 2-GPU DDP spawn is subsumed by the device mesh).
set -euo pipefail
python -m pose_estimation_tpu.cli \
    --config transparent_cleargrasp \
    --dataset_root "${CLEARGRASP_ROOT:-data/cleargrasp}" \
    --log_file "${LOG_DIR:-runs/transparent}" \
    "$@"
