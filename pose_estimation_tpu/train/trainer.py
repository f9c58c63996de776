"""Trainer: epoch loops, eval with on-device pose recovery, checkpointing.

Rebuild of tools/trainer.py (Trainer) with the reference's control flow —
opt_pose gating by START_POSE_EPOCH (train.py:187-228), best-model tracking
and manual LR decay on margin (tools/trainer.py:354-368), periodic
checkpoints — on top of compiled sharded steps (parallel/train_step.py),
JSONL metrics logging, and orbax checkpoints.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.configs.schema import Config
from pose_estimation_tpu.metrics.metric import PerObjectAccumulator
from pose_estimation_tpu.models.krrn import KRRN
from pose_estimation_tpu.parallel.mesh import (
    local_rows, make_mesh, replicated, shard_batch)
from pose_estimation_tpu.parallel.train_step import (
    build_eval_step, build_train_step)
from pose_estimation_tpu.train.checkpoint import CheckpointManager
from pose_estimation_tpu.train.guards import TrainGuard
from pose_estimation_tpu.train.optim import make_optimizer
from pose_estimation_tpu.train.state import TrainState
from pose_estimation_tpu.data.batching import (
    epoch_indices, eval_indices, make_batch)


class MetricsLogger:
    """JSONL (primary) + TensorBoard event mirror + console logging
    (replaces per-epoch file loggers and the TensorBoard SummaryWriter
    wiring, tools/trainer.py:109-131,273-279). Scalar payload entries are
    mirrored into ``log_dir/tb/<name>`` as standard tfevents files
    (utils/tb.py); non-scalar entries stay JSONL-only."""

    def __init__(self, log_dir: str, name: str = "train", tb: bool = True,
                 enabled: bool = True):
        # enabled=False: the rank-0-only convention under multi-host — the
        # reference logs/TBs from rank 0 alone (train.py:721,832-835);
        # non-primary processes keep the same API but write nothing.
        self.enabled = enabled
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self.f = open(self.path, "a") if enabled else None
        self.tb = None
        if tb and enabled:
            from pose_estimation_tpu.utils.tb import EventWriter
            self.tb = EventWriter(os.path.join(log_dir, "tb", name))

    def log(self, step: int, payload: dict, echo: bool = False):
        if not self.enabled:
            return
        def tofloat(v):
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return float(v)
            if getattr(v, "ndim", None) == 0:  # 0-d array scalar
                return float(v)
            return v  # strings / lists stay as-is (JSONL-only)

        rec = {"step": int(step), "time": time.time()}
        rec.update({k: tofloat(v) for k, v in payload.items()})
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self.tb is not None:
            for k, v in rec.items():
                if k not in ("step", "time") and isinstance(v, float):
                    self.tb.add_scalar(k, v, rec["step"])
            self.tb.flush()
        if echo:
            print(json.dumps(rec))

    def log_image(self, step: int, tag: str, img):
        """Mirror an HWC uint8 image grid into the TB stream (the
        reference's add_image at version/transparent/train.py:406)."""
        if self.tb is not None:
            self.tb.add_image(tag, np.asarray(img), int(step))
            self.tb.flush()


class Trainer:
    def __init__(self, cfg: Config, dataset, test_dataset=None,
                 log_dir: str = "runs/default", model=None,
                 resume: str | None = None,
                 resume_backbone_only: bool = False):
        self.cfg = cfg
        self.dataset = dataset
        self.test_dataset = test_dataset or dataset
        self.mesh = make_mesh(cfg.mesh.data, cfg.mesh.model, cfg.mesh.dcn)
        # Per-process disjoint data shards (DistributedSampler semantics,
        # train.py:1239): single-process runs see shard 0 of 1.
        self.shard_count = jax.process_count()
        self.shard_index = jax.process_index()
        self.primary = self.shard_index == 0
        self.model = model or KRRN(
            cfg=cfg, dtype=jnp.bfloat16 if cfg.train.amp else jnp.float32)
        # LR-anneal horizon = the steps THIS process will actually run:
        # per-process disjoint shards mean len(dataset)/shard_count
        # samples per epoch each.
        steps_per_epoch = max(
            1, len(dataset) // (cfg.train.batch_size * self.shard_count))
        self.tx = make_optimizer(
            cfg, total_steps=steps_per_epoch * cfg.train.num_epoch)
        self.train_step = build_train_step(self.model, self.tx, cfg)
        self.eval_step = build_eval_step(self.model, cfg)
        self.log = MetricsLogger(log_dir, "train", enabled=self.primary)
        self.eval_log = MetricsLogger(log_dir, "eval", enabled=self.primary)
        self.ckpt = CheckpointManager(os.path.join(log_dir, "ckpt"))
        self.resume = resume
        self.resume_backbone_only = resume_backbone_only
        # Escalation policy around the branch-free in-step NaN guard:
        # emergency ckpt on first non-finite step, abort on sustained
        # divergence (tools/trainer.py:100-107 promoted to a subsystem).
        self.guard = TrainGuard(ckpt_manager=self.ckpt)
        self.state = None

    def init_state(self, key=None) -> TrainState:
        key = key if key is not None else jax.random.PRNGKey(self.cfg.seed)
        k_init, k_state, k_batch = jax.random.split(key, 3)
        batch = make_batch(self.dataset, [0], k_batch,
                           self.cfg.data.input_size,
                           self.cfg.data.num_points)
        variables = self.model.init(
            {"params": k_init, "pool": k_init, "dropout": k_init},
            batch["img"], batch["cloud"], batch["choose"], batch["cls"],
            train=False)
        self.state = TrainState.create(
            variables["params"], self.tx, k_state,
            batch_stats=variables.get("batch_stats"))
        if self.resume and self.resume_backbone_only:
            # load_part_module equivalent (lib/utils/utlis.py:37-52):
            # merge shape-matching param leaves, fresh everything else
            # (optimizer state, step, RNG stay new).
            merged, n = CheckpointManager(self.resume).merge_partial_params(
                self.state.params)
            print(f"[trainer] partial restore: {n} matching param leaves "
                  f"from {self.resume}")
            self.state = self.state.replace(params=merged)
            return self.state
        source = CheckpointManager(self.resume) if self.resume else self.ckpt
        try:
            restored = source.restore(self.state)
        except Exception as e:  # incompatible/stale checkpoint: fresh start
            print(f"[trainer] checkpoint restore failed ({type(e).__name__});"
                  " starting fresh")
            restored = None
        if restored is not None:
            self.state = restored
        # Commit the state to the mesh (replicated): leaving it uncommitted
        # lets a cached single-device executable of train_step (compiled
        # from a direct unsharded-batch call, e.g. in tests) pin the step-1
        # output to device 0, which then conflicts with mesh-sharded
        # batches at step 2.
        self.state = jax.device_put(self.state, replicated(self.mesh))
        return self.state

    def train_epoch(self, epoch: int, steps: int | None = None):
        cfg = self.cfg
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)  # fresh augmentation draws
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), epoch)
        batches = epoch_indices(key, len(self.dataset), cfg.train.batch_size,
                                shard_count=self.shard_count,
                                shard_index=self.shard_index)
        if steps is not None:
            batches = batches[:steps]
        opt_pose = (cfg.train.enable_pose
                    and epoch >= cfg.train.start_pose_epoch)
        t0 = time.time()
        from pose_estimation_tpu.data.prefetch import prefetched_epoch
        stream = prefetched_epoch(self.dataset, batches, key,
                                  cfg.data.input_size, cfg.data.num_points)
        prev_metrics = None  # guard reads the PREVIOUS step's metrics so the
        # device never idles waiting on the current step's scalar
        for bi, batch in enumerate(stream):
            batch = shard_batch(self.mesh, batch)
            self.state, metrics = self.train_step(self.state, batch,
                                                  opt_pose=opt_pose)
            if prev_metrics is not None and self.guard.observe(
                    int(self.state.step) - 1,
                    {"skipped_nonfinite":
                     float(prev_metrics["skipped_nonfinite"])},
                    train_state=self.state):
                self.log.log(int(self.state.step),
                             {"epoch": epoch, "aborted_divergence": 1.0},
                             echo=True)
                break
            prev_metrics = metrics
            if bi % 20 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["epoch"] = epoch
                m["sec_per_step"] = (time.time() - t0) / (bi + 1)
                self.log.log(int(self.state.step), m)
            if (cfg.train.ckpt_every
                    and int(self.state.step) % cfg.train.ckpt_every == 0):
                # periodic 'current' checkpoint (tools/trainer.py:137-138)
                self.ckpt.save(int(self.state.step), self.state,
                               metrics={"periodic": 1.0}, force=True)
        return self.state

    def test_epoch(self, epoch: int, max_batches: int | None = None):
        cfg = self.cfg
        acc = PerObjectAccumulator(cfg.module.num_cls)
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 2), epoch)
        # Full-coverage eval: deterministic order, final batch padded and
        # the padding masked out of the accumulator — every test sample
        # scores exactly once (the reference walks the whole test loader,
        # tools/trainer.py:145-368; the old shuffled epoch_indices dropped
        # up to batch_size-1 samples per eval).
        # Multi-host: disjoint per-process shards (merged below); the
        # single-process default is shard 0 of 1 = the full set.
        batches, valid = eval_indices(len(self.test_dataset),
                                      cfg.train.batch_size,
                                      shard_count=self.shard_count,
                                      shard_index=self.shard_index)
        if max_batches is not None:
            batches, valid = batches[:max_batches], valid[:max_batches]
        # prefetched: host batch assembly (decode + splat label regen)
        # overlaps device eval — real-data eval was host-bound otherwise
        from pose_estimation_tpu.data.prefetch import prefetched_epoch
        stream = prefetched_epoch(self.test_dataset, batches,
                                  jax.random.fold_in(key, 1000),
                                  cfg.data.input_size, cfg.data.num_points)
        for bi, batch in enumerate(stream):
            batch = shard_batch(self.mesh, batch)
            out = self.eval_step(self.state, batch,
                                 jax.random.fold_in(key, bi))
            keep = valid[bi]
            # local_rows: this process's rows of the (possibly global)
            # batch — aligned with its shard of the sampler indices.
            acc.update(local_rows(batch["cls"])[keep],
                       {k: local_rows(v)[keep] for k, v in out.items()
                        if getattr(v, "ndim", 0) == 1})
            if bi == 0 and cfg.train.eval_viz and self.primary:
                # pred-vs-gt overlay grid per test epoch
                # (version/transparent/train.py:310-317,375-406 analog)
                from pose_estimation_tpu.utils.viz import save_eval_grid
                viz_dir = os.path.join(os.path.dirname(self.log.path), "viz")
                os.makedirs(viz_dir, exist_ok=True)
                try:
                    grid = save_eval_grid(
                        os.path.join(viz_dir, f"epoch_{epoch:04d}.png"),
                        batch, np.asarray(out["pred_r"]),
                        np.asarray(out["pred_t"]))
                    self.eval_log.log_image(epoch, "eval/pred_vs_gt", grid)
                except Exception as e:  # viz is best-effort (needs cv2)
                    print(f"[trainer] eval viz skipped: {e}")
        acc.all_reduce_across_processes()  # no-op single-process
        summary = acc.summary()
        mean_dis = summary["overall"].get("add_dis", float("inf"))
        self.eval_log.log(int(self.state.step),
                          {"epoch": epoch, **summary["overall"]}, echo=True)

        # Best-model tracking + manual LR decay on margin
        # (tools/trainer.py:354-368). Replaced scalars are device_put with
        # the mesh-replicated sharding: a bare jnp scalar is host-local
        # (single-device) and orbax refuses to serialize it in a
        # multi-host run; mean_dis comes from the allreduced summary so
        # every process computes the same value.
        rep = replicated(self.mesh)
        if mean_dis < float(self.state.best_dis):
            self.state = self.state.replace(
                best_dis=jax.device_put(np.float32(mean_dis), rep))
            self.ckpt.save(int(self.state.step), self.state,
                           metrics={"add_dis": mean_dis})
        if (self.cfg.train.lr.scheduler == "manual"
                and mean_dis < self.cfg.train.lr.decay_margin):
            new_scale = float(self.state.lr_scale) \
                * self.cfg.train.lr.decay_rate
            self.state = self.state.replace(
                lr_scale=jax.device_put(np.float32(new_scale), rep))
        return summary

    def fit(self, num_epochs: int | None = None,
            steps_per_epoch: int | None = None,
            eval_every: int = 1):
        if self.state is None:
            self.init_state()
        num_epochs = num_epochs or self.cfg.train.num_epoch
        for epoch in range(num_epochs):
            self.train_epoch(epoch, steps_per_epoch)
            if (epoch + 1) % eval_every == 0:
                self.test_epoch(epoch)
        return self.state
