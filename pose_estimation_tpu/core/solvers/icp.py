"""Iterative closest-point pose refinement (declarative layer).

Rebuild of the reference's declarative-refinement prototype
(version/transparent/scripts/train_declarative.py:42-109: pykeops KNN
correspondences + LeastSquaresLayer Kabsch fit, iterated 10 steps) and the
second-order implicit-diff least-squares layer it wraps
(version/transparent/lib/declarative/leastsquares.py:51-127).

Here the loop is a fixed-iteration lax.scan of (nearest-neighbor
correspondences -> weighted Kabsch) — one compiled program, batched;
gradients flow through the SVD-based Kabsch analytically (no hand-rolled
pinv-of-Hessian backward needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pose_estimation_tpu.core.geometry.rotations import transform_points
from pose_estimation_tpu.core.geometry.umeyama import kabsch
from pose_estimation_tpu.core.pointops import pairwise_sqdist
from pose_estimation_tpu.core.precision import matmul as _mm


@functools.partial(jax.jit, static_argnames=("iters", "trim_fraction"))
def icp_refine(src: jax.Array, dst: jax.Array, r0: jax.Array, t0: jax.Array,
               iters: int = 10, trim_fraction: float = 0.0):
    """Refine (r0, t0) so that r @ src + t aligns to the dst point set.

    src [B,N,3] (e.g. model points), dst [B,M,3] (e.g. backprojected depth
    cloud), r0 [B,3,3], t0 [B,3]. Returns (r, t, mean_residual [B]).

    Correspondences run dst -> src: each OBSERVED point is matched to its
    nearest model point. The observed cloud is typically a PARTIAL view
    (the visible surface), while src covers the whole object — matching
    src -> dst assigns every occluded-side model point a correspondence on
    the visible patch, and the Kabsch fit drags the model toward the
    camera even from a perfect initial pose (measured 4.2 deg / 2.8 mm
    drift on a hemisphere view of a sphere; the committed
    RESULTS_transparent add_dis_icp=0.044 m regression had this root
    cause). dst -> src is partial-overlap-safe: every observed point does
    lie on the true surface.

    trim_fraction > 0 soft-trims the worst correspondences each iteration
    (robust ICP — absorbs observed-cloud outliers such as bad depth/mask
    pixels) via distance-ranked weights — fixed shapes throughout.
    """
    m = dst.shape[1]
    keep = m - int(trim_fraction * m)

    def step(carry, _):
        r, t = carry
        moved = transform_points(src, r, t)              # [B,N,3]
        d = pairwise_sqdist(dst, moved)                  # [B,M,N]
        nn_idx = jnp.argmin(d, axis=-1)                  # [B,M] -> src idx
        corr = jnp.take_along_axis(src, nn_idx[..., None], axis=1)
        if trim_fraction > 0.0:
            nn_d = jnp.min(d, axis=-1)
            thresh = jnp.sort(nn_d, axis=-1)[:, keep - 1][:, None]
            w = (nn_d <= thresh).astype(src.dtype)
        else:
            w = jnp.ones(dst.shape[:2], src.dtype)
        r_new, t_new, _ = kabsch(corr, dst, weights=w)
        res = jnp.linalg.norm(transform_points(corr, r_new, t_new) - dst,
                              axis=-1)
        return (r_new, t_new), (w * res).sum(-1) / jnp.maximum(w.sum(-1), 1)

    (r, t), residuals = jax.lax.scan(step, (r0, t0), None, length=iters)
    return r, t, residuals[-1]


@functools.partial(jax.jit,
                   static_argnames=("iters", "trim_fraction",
                                    "accept_margin", "max_rot_deg",
                                    "max_trans"))
def gated_icp_refine(src: jax.Array, dst: jax.Array, r0: jax.Array,
                     t0: jax.Array, iters: int = 10,
                     trim_fraction: float = 0.0,
                     accept_margin: float = 0.15,
                     max_rot_deg: float = 10.0,
                     max_trans: float = 0.02):
    """ICP refinement with trust-region accept gating: returns
    (r_out, t_out, accepted [B] bool, refined_residual [B]).

    The refined pose is kept only when BOTH hold:
      1. it improves the refinement's own trimmed-correspondence
         objective (trimmed_residual) by more than `accept_margin`
         RELATIVE margin, and
      2. it stays within a trust region of the initial pose:
         rotation change < max_rot_deg AND translation change <
         max_trans (meters).

    Why the trust region (r5; measured): the r4 residual-only margin
    gate assumed that at convergence — direct pose at gt, observed
    cloud (the network's completed depth) carrying a ~2 cm bias — the
    improvement would sit near zero and the margin would reject.
    Regenerating the transparent artifact falsified that: against the
    biased cloud the trimmed objective can be cut by > 15% by ROTATING
    AWAY from gt (a wrong-rotation fit to the biased points survives
    the 30% trim), and the gate accepted 85% of frames while mean
    rotation error went 4.2 -> 23.3 deg. Against a biased target,
    better residual does not imply better pose — no residual-only gate
    can separate them. The trust region encodes what eval-time
    refinement is FOR: polishing a near-correct pose. A true polish
    moves the pose a little; a wrong-rotation re-estimate moves it far.
    Mid-training poses that are tens of degrees off no longer get the
    ICP rescue — acceptable, since the committed protocol measures the
    converged model (the reference ships no refinement in its committed
    eval at all; its prototype is scripts/train_declarative.py:42-109).
    """
    r_ref, t_ref, resid = icp_refine(src, dst, r0, t0, iters=iters,
                                     trim_fraction=trim_fraction)
    res_dir = trimmed_residual(src, dst, r0, t0, trim_fraction)
    res_ref = trimmed_residual(src, dst, r_ref, t_ref, trim_fraction)
    improves = res_ref < (1.0 - accept_margin) * res_dir
    # rotation geodesic distance between r0 and r_ref
    tr = jnp.trace(_mm(jnp.swapaxes(r0, -1, -2), r_ref),
                   axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    rot_change = jnp.degrees(jnp.arccos(cos))
    t_change = jnp.linalg.norm(t_ref - t0, axis=-1)
    in_trust = (rot_change < max_rot_deg) & (t_change < max_trans)
    accept = improves & in_trust
    r_out = jnp.where(accept[:, None, None], r_ref, r0)
    t_out = jnp.where(accept[:, None], t_ref, t0)
    return r_out, t_out, accept, resid


def trimmed_residual(src: jax.Array, dst: jax.Array, r: jax.Array,
                     t: jax.Array, trim_fraction: float = 0.0) -> jax.Array:
    """Trimmed dst->src nearest-neighbor residual of a GIVEN pose [B].

    The same objective icp_refine descends, evaluated at an arbitrary
    pose with fresh correspondences — the scorer for accept-if-better
    refinement gating: both the direct regressed pose and the ICP-refined
    pose are measured under this one objective and the better kept
    (build_transparent_eval_step). Mirrors icp_refine's correspondence
    direction and soft-trim exactly.
    """
    m = dst.shape[1]
    keep = m - int(trim_fraction * m)
    moved = transform_points(src, r, t)                  # [B,N,3]
    d = pairwise_sqdist(dst, moved)                      # [B,M,N]
    nn_d = jnp.sqrt(jnp.maximum(jnp.min(d, axis=-1), 0.0))
    if trim_fraction > 0.0:
        thresh = jnp.sort(nn_d, axis=-1)[:, keep - 1][:, None]
        w = (nn_d <= thresh).astype(src.dtype)
    else:
        w = jnp.ones_like(nn_d)
    return (w * nn_d).sum(-1) / jnp.maximum(w.sum(-1), 1)
