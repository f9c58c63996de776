"""Pose metrics: ADD / ADD-S / 5deg-5cm / AUC, batched on-device.

Rebuild of lib/utils/metric.py (PVN3D-style N x N ADD-S at :17-36, VOC-AP
ADD-AUC at :38-65, quaternion angular distance at :67-80) without kornia.
The per-frame Python accounting loops of the reference's test_epoch
(tools/trainer.py:174-368) become jit-able batch reductions here; host code
only aggregates scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.core.geometry.rotations import (
    angular_distance, transform_points)
from pose_estimation_tpu.core.pointops import min_dists


def add_metric(pred_r, pred_t, gt_r, gt_t, model_points, sym_mask):
    """ADD(-S) distances [B] (metric.py:17-36).

    model_points [B, N, 3]; sym objects use the chamfer (ADD-S) form.
    """
    pred = transform_points(model_points, pred_r, pred_t)
    gt = transform_points(model_points, gt_r, gt_t)
    direct = jnp.linalg.norm(pred - gt, axis=-1).mean(-1)
    chamfer = min_dists(pred, gt).mean(-1)
    return jnp.where(sym_mask > 0, chamfer, direct)


def rotation_deg(pred_r, gt_r):
    """Geodesic rotation error in degrees [B] (metric.py:67-80)."""
    return angular_distance(pred_r, gt_r)


def translation_m(pred_t, gt_t):
    """Euclidean translation error [B] (metric.py:82-84)."""
    return jnp.linalg.norm(pred_t - gt_t, axis=-1)


def pose_accuracy(pred_r, pred_t, gt_r, gt_t, model_points, sym_mask,
                  diameter, add_frac=0.1, deg_thresh=5.0, cm_thresh=0.05):
    """Batched accept/reject bits for the reference's acceptance criteria
    (tools/trainer.py:156-157,186-191): ADD(-S) < frac*diameter,
    rot < 5 deg AND trans < 5 cm. Returns dict of [B] float 0/1 arrays
    plus the raw distances.
    """
    dis = add_metric(pred_r, pred_t, gt_r, gt_t, model_points, sym_mask)
    rdeg = rotation_deg(pred_r, gt_r)
    tm = translation_m(pred_t, gt_t)
    return {
        "add_dis": dis,
        "rot_deg": rdeg,
        "trans_m": tm,
        "add_ok": (dis < add_frac * diameter).astype(jnp.float32),
        "add_ok_005": (dis < 0.05 * diameter).astype(jnp.float32),
        "add_ok_002": (dis < 0.02 * diameter).astype(jnp.float32),
        "deg_cm_ok": ((rdeg < deg_thresh) & (tm < cm_thresh)).astype(
            jnp.float32),
    }


def add_auc(distances: np.ndarray, max_dis: float = 0.1) -> float:
    """VOC-style ADD AUC (metric.py:38-65): integrate accuracy over distance
    thresholds in [0, max_dis]. Host-side (runs once per eval epoch)."""
    d = np.sort(np.asarray(distances).reshape(-1))
    n = len(d)
    if n == 0:
        return 0.0
    acc = np.cumsum(np.ones(n)) / n
    # clip at max_dis
    valid = d < max_dis
    if not valid.any():
        return 0.0
    d = np.concatenate([[0.0], d[valid], [max_dis]])
    acc = np.concatenate([[0.0], acc[valid], [acc[valid][-1]]])
    return float(np.trapezoid(acc, d) / max_dis)


class PerObjectAccumulator:
    """Host-side per-object metric table (replaces the reference's result
    dicts, tools/trainer.py:479-509). Feed batched metric dicts + class ids;
    read a per-object and overall summary."""

    def __init__(self, num_cls: int, names: list[str] | None = None):
        self.num_cls = num_cls
        self.names = names or [str(i) for i in range(num_cls)]
        self.reset()

    def reset(self):
        self.count = np.zeros(self.num_cls)
        self.sums = {}
        self.dis_all = [[] for _ in range(self.num_cls)]

    def update(self, cls_ids, metrics: dict):
        cls_ids = np.asarray(cls_ids).reshape(-1)
        onehot = np.eye(self.num_cls)[cls_ids]  # [B, C]
        self.count += onehot.sum(0)
        for k, v in metrics.items():
            v = np.asarray(v).reshape(-1)
            self.sums.setdefault(k, np.zeros(self.num_cls))
            self.sums[k] += (onehot * v[:, None]).sum(0)
        for c, d in zip(cls_ids, np.asarray(metrics["add_dis"]).reshape(-1)):
            self.dis_all[c].append(float(d))

    def all_reduce_across_processes(self):
        """Merge shard-local accumulators across jax processes.

        Multi-host eval shards the test set per process (disjoint
        eval_indices shards); summary() must then see the union. No-op
        single-process. Ragged per-class distance lists (AUC inputs) are
        NaN-padded to the global max length for the allgather.
        """
        import jax
        if jax.process_count() == 1:
            return self
        from jax.experimental import multihost_utils as mh
        self.count = np.asarray(mh.process_allgather(self.count)).sum(0)
        self.sums = {k: np.asarray(mh.process_allgather(v)).sum(0)
                     for k, v in self.sums.items()}
        lens = np.array([len(d) for d in self.dis_all], np.int32)
        all_lens = np.asarray(mh.process_allgather(lens))       # [P, C]
        m = max(int(all_lens.max()), 1)
        pad = np.full((self.num_cls, m), np.nan, np.float32)
        for c, d in enumerate(self.dis_all):
            pad[c, :len(d)] = d
        gathered = np.asarray(mh.process_allgather(pad))        # [P, C, m]
        self.dis_all = [
            [float(x) for p in range(gathered.shape[0])
             for x in gathered[p, c, :all_lens[p, c]]]
            for c in range(self.num_cls)]
        return self

    def summary(self) -> dict:
        cnt = np.maximum(self.count, 1)
        per_obj = {
            self.names[c]: {
                **{k: float(self.sums[k][c] / cnt[c]) for k in self.sums},
                "auc": add_auc(np.array(self.dis_all[c]) if self.dis_all[c]
                               else np.array([np.inf])),
                "count": int(self.count[c]),
            }
            for c in range(self.num_cls) if self.count[c] > 0
        }
        total = max(self.count.sum(), 1)
        overall = {k: float(self.sums[k].sum() / total) for k in self.sums}
        overall["count"] = int(self.count.sum())
        return {"per_object": per_obj, "overall": overall}
