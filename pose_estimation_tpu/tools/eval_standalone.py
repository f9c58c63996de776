"""Standalone per-object evaluation — tools/script/eval.py rebuilt.

Loads a checkpoint, runs batched eval over a dataset with the full
on-device pose recovery (optionally region-decoded coordinates,
eval.py:94-105), and prints the per-object ADD(-S) table at the
0.1d / 0.05d / 0.02d thresholds (eval.py:199-224).

Usage:
  python -m pose_estimation_tpu.tools.eval_standalone \
      --config lm_v3_1 --ckpt runs/exp/ckpt --synthetic
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="lm_v3_1")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--dataset_root", default="data/linemod")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--log_dir", default="runs/eval")
    p.add_argument("--region_decode", action="store_true",
                   help="region-decoded coordinates before PnP "
                        "(tools/script/eval.py:94-105); requires a "
                        "checkpoint trained with module.xyz_offset_decode")
    args = p.parse_args(argv)

    from pose_estimation_tpu.cli import build_dataset, load_config
    from pose_estimation_tpu.configs import schema
    from pose_estimation_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    if args.region_decode:
        cfg = schema.override(cfg, **{"module.xyz_offset_decode": True})
    ds = build_dataset(cfg, argparse.Namespace(
        synthetic=args.synthetic, dataset_root=args.dataset_root,
        frames_per_object=16))
    trainer = Trainer(cfg, ds, log_dir=args.log_dir)
    trainer.init_state()
    if args.ckpt:
        from pose_estimation_tpu.train.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.ckpt)
        restored = mgr.restore(trainer.state)
        if restored is not None:
            trainer.state = restored
    summary = trainer.test_epoch(0, max_batches=args.max_batches)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    main()
