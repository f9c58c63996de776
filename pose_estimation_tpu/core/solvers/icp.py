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
                                    "accept_margin"))
def gated_icp_refine(src: jax.Array, dst: jax.Array, r0: jax.Array,
                     t0: jax.Array, iters: int = 10,
                     trim_fraction: float = 0.0,
                     accept_margin: float = 0.15):
    """ICP refinement with accept-if-better gating: returns
    (r_out, t_out, accepted [B] bool, refined_residual [B]).

    Both the initial pose and the ICP-refined pose are scored under the
    refinement's own trimmed-correspondence objective (trimmed_residual)
    and the refined pose is kept only when it improves that residual by
    more than `accept_margin` RELATIVE margin. Rationale for the margin
    (not plain argmin): the refined pose descends exactly this objective,
    so it near-always scores <= the initial pose on it; the failure mode
    is a converged model whose direct pose is already at gt while the
    observed cloud (here: the network's completed depth) carries a ~2 cm
    quality floor — refining then swaps sub-mm gt error for the depth
    head's bias. In that regime both residuals sit at the same floor
    (improvement ~0), while a genuinely bad mid-training pose improves
    the residual by its whole error. The relative-margin gate keeps the
    mid-training crossover win and rejects the converged-model
    regression (the reference ships no such gate — its refinement
    prototype is scripts/train_declarative.py:42-109)."""
    r_ref, t_ref, resid = icp_refine(src, dst, r0, t0, iters=iters,
                                     trim_fraction=trim_fraction)
    res_dir = trimmed_residual(src, dst, r0, t0, trim_fraction)
    res_ref = trimmed_residual(src, dst, r_ref, t_ref, trim_fraction)
    accept = res_ref < (1.0 - accept_margin) * res_dir
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
