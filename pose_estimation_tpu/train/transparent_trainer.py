"""Transparent-pipeline trainer: TRPESNet / TransparentPoseNet loops.

Rebuild of the four trainer classes of version/transparent/train.py
(:120-1074) collapsed into ONE sharded implementation: the reference needed
separate instance-loop / batched / DDP / DDP-instance-loop trainers because
its per-image instance lists had dynamic shapes and NCCL needed a process
per GPU; with one-instance-per-sample records (data/cleargrasp.py) and mesh
sharding, a single batched jit step covers all four.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.losses.transparent_loss import transparent_loss
from pose_estimation_tpu.parallel.mesh import make_mesh, shard_batch
from pose_estimation_tpu.train.checkpoint import CheckpointManager
from pose_estimation_tpu.train.state import TrainState


DEFAULT_WEIGHTS = {
    # TRAIN.LOSS_WEIGHT schema (version/transparent/train.py:81-88)
    "distance": 1.0, "rotation": 1.0, "normal": 1.0,
    "depth": 1.0, "mask": 1.0, "boundary": 1.0,
}


def build_transparent_train_step(model, tx, weights=None) -> Callable:
    """train_step(state, batch) -> (state, metrics) for TRPESNet-style
    models. batch: img, intrinsic, xmap, ymap, d_scale, obj + gt fields
    (target/model_points/sym_mask/axis/r/normal/depth/mask)."""
    weights = weights or DEFAULT_WEIGHTS

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        rng, new_rng = jax.random.split(state.rng)
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            rx, tx_, cx, n, d, m = model.apply(
                {"params": params}, batch["img"], batch["intrinsic"],
                batch["xmap"], batch["ymap"], batch["d_scale"],
                batch["obj"], train=True,
                rngs={"choose": step_rng,
                      "dropout": jax.random.fold_in(step_rng, 1)})
            pred = {"quat": rx, "trans": tx_, "conf": cx,
                    "normal": n, "depth": d, "mask": m}
            losses = transparent_loss(pred, batch, weights)
            return losses["all_loss"], losses

        (loss, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        finite = jnp.isfinite(loss)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        new_state = state.apply_gradients(tx, grads, rng=new_rng)
        losses["skipped_nonfinite"] = (~finite).astype(jnp.float32)
        return new_state, losses

    return train_step


def build_transparent_eval_step(model) -> Callable:
    """Best-confidence pose extraction + ADD(-S) — the transparent test
    loop (train.py:305-426) as one compiled program."""
    from pose_estimation_tpu.core.geometry.allocentric import (
        allo_to_ego_matrix)
    from pose_estimation_tpu.core.geometry.rotations import quat_to_matrix
    from pose_estimation_tpu.metrics.metric import add_metric

    @jax.jit
    def eval_step(state, batch):
        rx, tx_, cx, n, d, m = model.apply(
            {"params": state.params}, batch["img"], batch["intrinsic"],
            batch["xmap"], batch["ymap"], batch["d_scale"], batch["obj"],
            train=False)
        best = jnp.argmax(cx[..., 0], axis=1)                   # [B]
        take = lambda x: jnp.take_along_axis(
            x, best[:, None, None], axis=1)[:, 0]
        quat = take(rx)
        trans = take(tx_)
        r_allo = quat_to_matrix(quat)
        r_ego = allo_to_ego_matrix(trans, r_allo)
        dis = add_metric(r_ego, trans, batch["r"], batch["t"],
                         batch["model_points"], batch["sym_mask"])
        return {"add_dis": dis, "pred_r": r_ego, "pred_t": trans,
                "pred_normal": n, "pred_depth": d, "pred_mask": m}

    return eval_step
