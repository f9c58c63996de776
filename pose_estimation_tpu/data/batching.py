"""Batch assembly: full frames -> stacked, model-ready training batches.

The glue between a frame source (data/synthetic.py now; data/linemod.py for
the real datasets) and the compiled train/eval steps. Replaces the
reference's DataLoader + my_colla_fn size-bucketing + process_patch_datas
re-batching (torch_utils.py:96-110, tools/trainer.py:521-551): with static
crop sizes there is nothing to bucket — every sample maps through the same
jit program and stacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.data.pipeline import prepare_sample


def frame_to_sample(key, frame: dict, obj, crop_size: int, num_points: int):
    """One rendered/loaded frame + object meta -> sample dict (jnp)."""
    jframe = {
        "rgb": jnp.asarray(frame["rgb"], jnp.float32),
        "depth": jnp.asarray(frame["depth"], jnp.float32),
        "mask": jnp.asarray(frame["mask"]),
        "coordinate": jnp.asarray(frame["coordinate"], jnp.float32),
        "normal": jnp.asarray(frame["normal"], jnp.float32),
        "region": jnp.asarray(frame["region"], jnp.int32),
        "k": jnp.asarray(frame["k"], jnp.float32),
    }
    if "det_center" in frame:  # detection-bbox eval crops (lm_bop.py:170)
        jframe["det_center"] = jnp.asarray(frame["det_center"], jnp.float32)
        jframe["det_side"] = jnp.asarray(frame["det_side"], jnp.float32)
    s = prepare_sample(key, jframe, jnp.asarray(obj.lf_border),
                       jnp.asarray(obj.extent), crop_size=crop_size,
                       num_points=num_points)
    if "t_noise" in frame:
        # translation jitter on the cloud + gt translation together
        # (DenseFusion-style noise_trans aug; geometry stays consistent,
        # only the t-regression sees the shift)
        tn = jnp.asarray(frame["t_noise"], jnp.float32)
        s["cloud"] = s["cloud"] + tn
        frame = dict(frame)
        frame["t"] = np.asarray(frame["t"], np.float32) + np.asarray(
            frame["t_noise"], np.float32)
    cls_id = int(frame["cls_id"])
    r = np.asarray(frame["r"], np.float32)
    t = np.asarray(frame["t"], np.float32)
    target = obj.model_points @ r.T + t
    # region_point = origin + FPS centers, normalized like the xyz labels
    # (batchdataset.py:723-728); row 0 pairs with region label 0 (bg).
    region_points = np.concatenate(
        [np.zeros((1, 3), np.float32), obj.fps_centers], axis=0)
    region_points = (region_points - obj.lf_border) / obj.extent
    s.update({
        "cls": jnp.asarray(cls_id, jnp.int32),
        "multi_cls_mask": jnp.where(
            s["valid"], jnp.int32(cls_id + 1), 0),
        "target": jnp.asarray(target, jnp.float32),
        "model_points": jnp.asarray(obj.model_points, jnp.float32),
        "target_r": jnp.asarray(r),
        "target_t": jnp.asarray(t),
        "sym_mask": jnp.asarray(float(obj.sym), jnp.float32),
        "lf_border": jnp.asarray(obj.lf_border),
        "extent": jnp.asarray(obj.extent),
        "region_points": jnp.asarray(region_points, jnp.float32),
        "diameter": jnp.asarray(obj.diameter, jnp.float32),
        "k": jframe["k"],
    })
    return s


def make_batch(dataset, indices, key, crop_size: int = 128,
               num_points: int = 1024):
    """Stack samples for `indices` into one batch dict of [B, ...] arrays."""
    # cls_id is the 0-based class index in every frame dict; datasets whose
    # `objects` container is keyed differently (LinemodBOPDataset keys by
    # BOP object id 1..15) expose `objects_by_cls` with 0-based order.
    by_cls = getattr(dataset, "objects_by_cls", None) or dataset.objects
    samples = []
    for j, i in enumerate(indices):
        frame = dataset[int(i)]
        obj = by_cls[frame["cls_id"]]
        samples.append(frame_to_sample(
            jax.random.fold_in(key, j), frame, obj, crop_size, num_points))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *samples)


def epoch_indices(key, num_samples: int, batch_size: int, shard_count: int = 1,
                  shard_index: int = 0):
    """Shuffled per-epoch index batches; disjoint shards per host — the
    DistributedSampler semantics (train.py:1239, set_epoch reshuffle) done
    as seeded index arithmetic. Training-only: drops the <batch_size tail
    (like torch drop_last); eval must use `eval_indices` to cover every
    sample."""
    perm = np.asarray(jax.random.permutation(key, num_samples))
    perm = perm[shard_index::shard_count]
    # Every shard must run the SAME number of batches: each batch enters a
    # collective SPMD program, so a process with one extra batch would call
    # it alone and deadlock the cluster (shard lengths differ by 1 when
    # num_samples % shard_count != 0, and that extra sample crosses a
    # batch boundary for ~many (n, bs, shards) configs). Agree on
    # min-over-shards = floor(num_samples/shard_count) batches — computed
    # identically on every process with no communication.
    n_batches = (num_samples // shard_count) // batch_size
    return perm[: n_batches * batch_size].reshape(n_batches, batch_size)


def eval_indices(num_samples: int, batch_size: int, shard_count: int = 1,
                 shard_index: int = 0):
    """Deterministic full-coverage eval batches: (indices, valid).

    Every sample appears exactly once, in dataset order; the final batch is
    padded by repeating index 0 and `valid` marks the real rows so the
    metric accumulator can drop padding. The reference evaluates the whole
    test loader (tools/trainer.py:145-368); the shuffled+truncated
    epoch_indices silently skipped up to batch_size-1 samples per eval.
    """
    ids = np.arange(num_samples)[shard_index::shard_count]
    # Same number of batches on EVERY shard (see epoch_indices): eval
    # batches also enter collective programs, so the count is agreed as
    # max-over-shards = ceil(ceil(num_samples/shard_count)/batch_size);
    # shorter shards run extra all-padding (valid=False) batches that the
    # metric accumulator drops.
    longest = -(-num_samples // max(shard_count, 1))
    n_batches = max(1, -(-longest // batch_size))
    pad = n_batches * batch_size - len(ids)
    valid = np.concatenate([np.ones(len(ids), bool), np.zeros(pad, bool)])
    ids = np.concatenate([ids, np.zeros(pad, ids.dtype)])
    return (ids.reshape(n_batches, batch_size),
            valid.reshape(n_batches, batch_size))
