"""Command-line entry point — argparse-flag parity with the reference's
train.py:30-62 (--dataset, --cls_type, --config_file, --eval_mode,
--resume_posenet, --log_file, --debug ...), dispatching to the TPU trainer.

Config files are python modules exposing `get_config() -> Config` (the
typed replacement for mmcv Config.fromfile, train.py:64); named presets in
configs/schema.py can be selected with --config <name>.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

from pose_estimation_tpu.configs import schema


def load_config(spec: str) -> schema.Config:
    if spec.endswith(".py"):
        mod_spec = importlib.util.spec_from_file_location("user_config", spec)
        mod = importlib.util.module_from_spec(mod_spec)
        mod_spec.loader.exec_module(mod)
        return mod.get_config()
    factory = getattr(schema, spec, None)
    if factory is None:
        raise SystemExit(f"unknown config preset: {spec}")
    return factory()


def build_dataset(cfg: schema.Config, args, mode: str = "train"):
    if cfg.dataset == "synthetic" or args.synthetic:
        from pose_estimation_tpu.data.synthetic import (
            SyntheticPoseDataset, SyntheticTransparentDataset)
        ds_cls = (SyntheticTransparentDataset
                  if cfg.pipeline == "transparent" else SyntheticPoseDataset)
        return ds_cls(
            num_objects=cfg.module.num_cls,
            frames_per_object=args.frames_per_object,
            num_regions=cfg.data.num_regions)
    if cfg.dataset == "linemod":
        from pose_estimation_tpu.data.linemod import LinemodDataset
        return LinemodDataset(args.dataset_root, mode=mode,
                              cls_type=cfg.cls_type, cfg=cfg)
    if cfg.dataset == "ycb":
        from pose_estimation_tpu.data.ycb import YCBVideoDataset
        # split='train' composes train_real + train_synt with synthetic
        # background paste (dataset.py:43-50,236-244)
        split = "train" if mode == "train" else "test"
        return YCBVideoDataset(args.dataset_root, split=split,
                               cls_type=cfg.cls_type,
                               num_regions=cfg.data.num_regions,
                               background_dir=getattr(
                                   args, "background_dir", None))
    if cfg.dataset == "cleargrasp":
        from pose_estimation_tpu.data.cleargrasp import ClearGraspDataset
        return ClearGraspDataset(
            args.dataset_root, split="train" if mode == "train" else "val")
    raise SystemExit(f"unknown dataset: {cfg.dataset}")


def main(argv=None):
    import jax
    from pose_estimation_tpu.utils.cache import enable_cache
    enable_cache(jax, min_compile_secs=1.0)
    p = argparse.ArgumentParser("pose_estimation_tpu")
    p.add_argument("--config", "--config_file", default="lm_v3_1",
                   help="preset name in configs.schema or a .py file")
    p.add_argument("--dataset", default=None)
    p.add_argument("--cls_type", default=None)
    p.add_argument("--dataset_root", default="data/linemod")
    p.add_argument("--log_file", "--log_dir", dest="log_dir",
                   default="runs/default")
    p.add_argument("--eval_mode", action="store_true")
    p.add_argument("--resume", "--resume_posenet", dest="resume",
                   default=None, help="checkpoint dir (orbax) to resume")
    p.add_argument("--resume_backbone_only", action="store_true",
                   help="partial restore: merge shape-matching param leaves "
                        "only (load_part_module, lib/utils/utlis.py:37-52)")
    p.add_argument("--debug", action="store_true",
                   help="5-step epochs (train.py:82-85 semantics)")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic fixture dataset")
    p.add_argument("--frames_per_object", type=int, default=64)
    p.add_argument("--background_dir", default=None,
                   help="background image dir for synthetic-frame paste "
                        "(the reference uses COCO val2017, dataset.py:25)")
    p.add_argument("--epochs", type=int, default=None)
    args = p.parse_args(argv)

    cfg = load_config(args.config)
    if args.dataset:
        cfg = cfg.replace(dataset=args.dataset)
    if args.cls_type:
        cfg = cfg.replace(cls_type=args.cls_type)

    mode = "eval" if args.eval_mode else "train"
    dataset = build_dataset(cfg, args, mode=mode)
    if cfg.pipeline == "transparent":
        from pose_estimation_tpu.train.transparent_trainer import (
            TransparentTrainer)
        trainer = TransparentTrainer(cfg, dataset, log_dir=args.log_dir,
                                     resume=args.resume)
    else:
        from pose_estimation_tpu.train.trainer import Trainer
        trainer = Trainer(cfg, dataset, log_dir=args.log_dir,
                          resume=args.resume,
                          resume_backbone_only=args.resume_backbone_only)
    trainer.init_state()

    if args.eval_mode:
        summary = trainer.test_epoch(0)
        print(json.dumps(summary, indent=2))
        return 0

    steps = 5 if args.debug else None
    trainer.fit(num_epochs=args.epochs, steps_per_epoch=steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
