"""Declarative ICP refinement demo: measure how much trimmed-ICP against
the depth cloud improves noisy pose estimates on the synthetic fixture.

Rebuild of version/transparent/scripts/train_declarative.py (:42-109),
which prototypes "KNN correspondences + least-squares fit x10" on top of
the declarative LS layer. Here the whole refinement is one jit program
(core/solvers/icp.icp_refine: fixed-iteration lax.scan, soft-trimmed
robust correspondences) and this tool quantifies its effect: perturb the
gt pose by a controlled rotation/translation noise, refine against the
backprojected depth cloud, report before/after ADD.

Measured on the fixture (16 frames, 10 deg / 20 mm noise): translation
20 -> 3.8 mm and ADD 20.9 -> 14.3 mm, mean residual 2.1 mm — but rotation
DEGRADES (10 -> 20 deg): the fixture's smooth star-shaped blobs are
locally near-symmetric, so a geometry-only alignment slides on the
surface to a low-residual aliased rotation. This is precisely the
method's design rationale: rotation must come from texture-anchored
per-pixel coordinates + PnP (the KRRN route, 9.5 deg trained), while
depth alignment nails translation; geometric refinement is a
translation/centering tool here, not a rotation fixer.

Usage:
  python -m pose_estimation_tpu.tools.refine_declarative \
      [--rot_deg 10] [--trans_mm 20] [--trim 0.3]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rot_deg", type=float, default=10.0)
    p.add_argument("--trans_mm", type=float, default=20.0)
    p.add_argument("--trim", type=float, default=0.3)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--frames", type=int, default=16)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from pose_estimation_tpu.utils.cache import enable_cache
    enable_cache(jax, min_compile_secs=1.0)

    from pose_estimation_tpu.core.geometry.rotations import (
        angular_distance, axis_angle_to_matrix)
    from pose_estimation_tpu.core.solvers.icp import icp_refine
    from pose_estimation_tpu.data.batching import make_batch
    from pose_estimation_tpu.data.synthetic import SyntheticPoseDataset
    from pose_estimation_tpu.metrics.metric import add_metric

    ds = SyntheticPoseDataset(num_objects=4,
                              frames_per_object=args.frames // 4 + 1,
                              im_h=240, im_w=320, num_regions=16)
    key = jax.random.PRNGKey(0)
    batch = make_batch(ds, list(range(args.frames)), key, 96, 512)

    # perturb gt poses
    rng = np.random.RandomState(0)
    axis = rng.randn(args.frames, 3)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    dr = axis_angle_to_matrix(jnp.asarray(
        axis * np.radians(args.rot_deg), jnp.float32))
    r0 = jnp.einsum("bij,bjk->bik", dr, batch["target_r"])
    dt = rng.randn(args.frames, 3)
    dt = dt / np.linalg.norm(dt, axis=-1, keepdims=True) * args.trans_mm / 1e3
    t0 = batch["target_t"] + jnp.asarray(dt, jnp.float32)

    refine = jax.jit(lambda s, d, r, t: icp_refine(
        s, d, r, t, iters=args.iters, trim_fraction=args.trim))
    # src = the VISIBLE surface in the model frame (gt coordinate map at
    # the chosen pixels), mirroring the reference prototype, which aligns
    # per-pixel predicted coordinates against the cloud
    # (train_declarative.py:42-109). Note icp_refine now matches
    # dst -> src (each observed point to its nearest model point), so a
    # full-model src is also partial-overlap-safe; the visible subset is
    # kept because per-pixel coordinates are what a coordinate head emits.
    from pose_estimation_tpu.data.pipeline import denormalize_xyz
    xyz = denormalize_xyz(batch["xyz"], batch["lf_border"], batch["extent"])
    b, s, _, _ = xyz.shape
    flat = xyz.reshape(b, s * s, 3)
    src = jnp.take_along_axis(flat, batch["choose"][..., None], 1)[:, :256]
    r1, t1, res = refine(src, batch["cloud"], r0, t0)

    def summarize(r, t):
        dis = add_metric(r, t, batch["target_r"], batch["target_t"],
                         batch["model_points"], batch["sym_mask"])
        return {
            "add_mm": round(float(jnp.mean(dis)) * 1000, 2),
            "rot_deg": round(float(jnp.mean(
                angular_distance(r, batch["target_r"]))) , 2),
            "trans_mm": round(float(jnp.mean(jnp.linalg.norm(
                t - batch["target_t"], axis=-1))) * 1000, 2),
        }

    out = {"noise": {"rot_deg": args.rot_deg, "trans_mm": args.trans_mm},
           "before": summarize(r0, t0),
           "after": summarize(r1, t1),
           "mean_residual_mm": round(float(jnp.mean(res)) * 1000, 2)}
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    main()
