#!/usr/bin/env bash
# LineMOD training launch (tools/train_lm.sh equivalent):
#   CUDA_VISIBLE_DEVICES=1 python train.py --log_file 24 --cls_type all \
#       --config_file config/linemod/lm_v3_1.py
# On TPU there is no per-device env pinning — the mesh covers all local
# devices; set mesh.data via config override for a subset.
set -euo pipefail
python -m pose_estimation_tpu.cli \
    --config lm_v3_1 \
    --dataset linemod \
    --cls_type all \
    --dataset_root "${LINEMOD_ROOT:-data/linemod}" \
    --log_file "${LOG_DIR:-runs/lm_v3_1}" \
    "$@"
# eval:   scripts/train_lm.sh --eval_mode
# resume: scripts/train_lm.sh --resume runs/lm_v3_1/ckpt
