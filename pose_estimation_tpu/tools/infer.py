"""Batched image->pose inference service — the deployment surface.

Loads trained params (orbax checkpoint dir or a params .npz from
train/checkpoint.save_params_npz), compiles the ground-truth-free serving
program (parallel/train_step.build_infer_step: KRRN forward + on-device
PnP-RANSAC, two jit programs), streams the dataset through the threaded
prefetcher, and writes one JSONL record per frame: rotation matrix,
regressed translation, PnP translation, inlier count. A summary JSON line
(frames / wall seconds / fps) goes to stdout.

The reference has no label-free inference path — every eval script walks
a labeled loader and computes metrics (tools/trainer.py:145-368,
tools/script/eval.py); serving there would mean stripping one by hand.
Here the compiled program provably reads no gt field (tests/test_infer.py
deletes them all), so the same code path serves detection-cropped frames
in production and benchmarks at the committed ≥500 fps/chip operating
point (bench.py measures the same two-program pipeline plus metrics).

Usage:
  python -m pose_estimation_tpu.tools.infer --config lm_v3_1 \
      --ckpt runs/exp/ckpt --synthetic --batch_size 32 --output poses.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="lm_v3_1")
    p.add_argument("--ckpt", default=None,
                   help="orbax checkpoint dir (full TrainState)")
    p.add_argument("--params", default=None,
                   help="params-only .npz (save_params_npz format)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--dataset_root", default="data/linemod")
    p.add_argument("--frames_per_object", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--output", default="poses.jsonl")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    from pose_estimation_tpu.utils.cache import enable_cache
    enable_cache(jax, min_compile_secs=1.0)
    import jax.numpy as jnp
    import numpy as np

    from pose_estimation_tpu.cli import build_dataset, load_config
    from pose_estimation_tpu.data.batching import eval_indices
    from pose_estimation_tpu.data.prefetch import prefetched_epoch
    from pose_estimation_tpu.models.krrn import KRRN
    from pose_estimation_tpu.parallel.train_step import build_infer_step

    cfg = load_config(args.config)
    dataset = build_dataset(cfg, args, mode="eval")
    model = KRRN(cfg=cfg,
                 dtype=jnp.bfloat16 if cfg.train.amp else jnp.float32)
    key = jax.random.PRNGKey(args.seed)

    # Params: npz file > orbax checkpoint > fresh init (smoke mode).
    batch_stats = None
    if args.params and args.ckpt:
        raise SystemExit("--params and --ckpt are mutually exclusive; "
                         "pass one source of weights")
    if args.params:
        if cfg.module.norm == "bn":
            raise SystemExit(
                "--params npz carries no batch_stats; a BatchNorm-parity "
                "config (module.norm='bn') needs the full train state — "
                "use --ckpt <orbax dir> instead")
        from pose_estimation_tpu.train.checkpoint import load_params_npz
        params = load_params_npz(args.params)
    else:
        from pose_estimation_tpu.data.batching import make_batch
        probe = make_batch(dataset, [0], key, cfg.data.input_size,
                           cfg.data.num_points)
        variables = jax.jit(model.init, static_argnames="train")(
            {"params": key}, probe["img"], probe["cloud"], probe["choose"],
            probe["cls"], train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        if args.ckpt:
            from pose_estimation_tpu.train.checkpoint import (
                CheckpointManager)
            from pose_estimation_tpu.train.optim import make_optimizer
            from pose_estimation_tpu.train.state import TrainState
            template = TrainState.create(params, make_optimizer(cfg), key,
                                         batch_stats=batch_stats)
            restored = CheckpointManager(args.ckpt).restore(template)
            if restored is None:
                raise SystemExit(f"no checkpoint found in {args.ckpt}")
            params = restored.params
            batch_stats = restored.batch_stats

    infer_step = build_infer_step(model, cfg)

    batches, valid = eval_indices(len(dataset), args.batch_size)
    if args.max_batches is not None:
        batches, valid = batches[:args.max_batches], valid[:args.max_batches]
    stream = prefetched_epoch(dataset, batches, jax.random.fold_in(key, 7),
                              cfg.data.input_size, cfg.data.num_points)

    n_frames = 0
    t_first = t0 = time.perf_counter()
    with open(args.output, "w") as f:
        for bi, batch in enumerate(stream):
            out = infer_step(params, batch, jax.random.fold_in(key, bi),
                             batch_stats=batch_stats)
            out = {k: np.asarray(v) for k, v in out.items()}
            if bi == 0:
                # first batch includes compile; report steady-state fps
                t0 = time.perf_counter()
            keep = valid[bi]
            cls = np.asarray(batch["cls"])
            for j in np.nonzero(keep)[0]:
                f.write(json.dumps({
                    "index": int(batches[bi][j]),
                    "cls": int(cls[j]),
                    "r": [[round(float(x), 6) for x in row]
                          for row in out["pred_r"][j]],
                    "t": [round(float(x), 6) for x in out["pred_t"][j]],
                    "pnp_t": [round(float(x), 6)
                              for x in out["pnp_t"][j]],
                    "num_inliers": int(out["num_inliers"][j]),
                    "reproj_mse_px": round(float(out["mean_err"][j]), 4),
                }) + "\n")
                n_frames += 1
    wall = time.perf_counter() - t0
    steady = n_frames - int(valid[0].sum())
    print(json.dumps({
        "frames": n_frames,
        "output": args.output,
        "wall_s": round(time.perf_counter() - t_first, 3),
        "steady_fps": (round(steady / wall, 2) if steady > 0 and wall > 0
                       else None),
    }))
    return 0


if __name__ == "__main__":
    main()
