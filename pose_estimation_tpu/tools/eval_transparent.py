"""Standalone transparent-pipeline evaluation — the rebuild of
version/transparent/eval.py (:29-69): load a checkpoint, run the batched
eval step over a dataset, print the per-object ADD(-S) success table (the
committed eval_log.txt:534-539 format, as JSON).

Usage:
  python -m pose_estimation_tpu.tools.eval_transparent \
      --config transparent_cleargrasp --ckpt runs/transparent/ckpt \
      --dataset_root data/cleargrasp
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="transparent_cleargrasp")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--dataset_root", default="data/cleargrasp")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--log_dir", default="runs/eval_transparent")
    args = p.parse_args(argv)

    from pose_estimation_tpu.cli import build_dataset, load_config
    from pose_estimation_tpu.train.transparent_trainer import (
        TransparentTrainer)

    cfg = load_config(args.config)
    ds = build_dataset(cfg, argparse.Namespace(
        synthetic=args.synthetic, dataset_root=args.dataset_root,
        frames_per_object=16), mode="eval")
    trainer = TransparentTrainer(cfg, ds, log_dir=args.log_dir,
                                 resume=args.ckpt)
    trainer.init_state()
    summary = trainer.test_epoch(0, max_batches=args.max_batches)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    main()
