"""Levenberg-Marquardt pose refinement on reprojection residuals.

The on-device counterpart of OpenCV's `solvePnP(SOLVEPNP_ITERATIVE,
useExtrinsicGuess=True)` used by BPnP's forward (lib/network/dnn/BPnP.py:44)
and implicitly inside solvePnPRansac's refinement stage. Fixed iteration
count, damped normal-equation solves, per-point weights for inlier masking —
a single compiled XLA program, vmap-able over a batch of instances.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pose_estimation_tpu.core.geometry.rotations import axis_angle_to_matrix
from pose_estimation_tpu.core.geometry.intrinsics import project_points
from pose_estimation_tpu.core.precision import matmul as _mm

_EPS = 1e-12


def reprojection_residuals(pose6: jax.Array, pw: jax.Array, uv: jax.Array,
                           k: jax.Array) -> jax.Array:
    """pose6 = [rvec(3), t(3)] -> flattened weighted residuals [n*2]."""
    r = axis_angle_to_matrix(pose6[:3])
    pc = _mm(pw, r.T) + pose6[3:]
    proj = project_points(pc, k)
    return (proj - uv).reshape(-1)


@partial(jax.jit, static_argnames=("iters",))
def refine_pose_lm(pose6_init: jax.Array, pw: jax.Array, uv: jax.Array,
                   k: jax.Array, weights: jax.Array, iters: int = 10):
    """Damped Gauss-Newton (LM) minimization of weighted reprojection error.

    pose6_init: [6] (rvec, t); pw [n, 3]; uv [n, 2]; weights [n].
    Returns (pose6, final mean squared pixel error over weighted points).
    """
    w2 = jnp.repeat(weights, 2)  # per-residual weights

    def cost(p):
        res = reprojection_residuals(p, pw, uv, k)
        return jnp.sum(w2 * res * res)

    def step(carry, _):
        pose, lam = carry
        res = reprojection_residuals(pose, pw, uv, k)
        jac = jax.jacfwd(reprojection_residuals)(pose, pw, uv, k)  # [2n, 6]
        jtj = _mm(jac.T, w2[:, None] * jac)
        g = _mm(jac.T, (w2 * res)[:, None])[:, 0]
        delta = jnp.linalg.solve(
            jtj + lam * jnp.diag(jnp.diagonal(jtj)) + _EPS * jnp.eye(6), g)
        new_pose = pose - delta
        # current cost from the residual already in hand (the RANSAC stage
        # is latency-bound on kernel count; one residual pass per
        # iteration, not three)
        improved = cost(new_pose) < jnp.sum(w2 * res * res)
        pose = jnp.where(improved, new_pose, pose)
        lam = jnp.where(improved, jnp.maximum(lam * 0.3, 1e-8),
                        jnp.minimum(lam * 3.0, 1e6))
        return (pose, lam), None

    (pose, _), _ = jax.lax.scan(step, (pose6_init, jnp.float32(1e-3)),
                                None, length=iters)
    res = reprojection_residuals(pose, pw, uv, k).reshape(-1, 2)
    mse = (weights * jnp.sum(res * res, -1)).sum() / jnp.maximum(
        weights.sum(), _EPS)
    return pose, mse
