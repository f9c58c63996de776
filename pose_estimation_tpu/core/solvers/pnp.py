"""PnP-RANSAC, fully on-device, with implicit-function-theorem gradients.

Replaces the reference's eval-time CPU hop
(`cv2.solvePnPRansac(model_points, pixels, K, SOLVEPNP_EPNP,
confidence=0.9999, reprojectionError=1)` — tools/trainer.py:423-427) AND the
back-propagatable PnP autograd.Function (lib/network/dnn/BPnP.py:8-117) in a
single jit-compiled, batched, fixed-shape program:

- hypothesis generation: H minimal subsets -> vmapped EPnP
- scoring: reprojection inliers over all points (masked, static shape)
- refinement: LM on the soft-inlier-weighted full set
- gradients: `pnp_implicit` wraps the refined solution in a custom_vjp via
  the implicit function theorem on the stationarity of the weighted
  reprojection objective — the same math BPnP builds row by row with
  torch.autograd (BPnP.py:53-117), here as two jax.vjp calls and one
  6x6 solve.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pose_estimation_tpu.core.geometry.rotations import (
    axis_angle_to_matrix, matrix_to_axis_angle)
from pose_estimation_tpu.core.solvers.epnp import epnp, epnp_fast
from pose_estimation_tpu.core.solvers.lm import (
    refine_pose_lm, reprojection_residuals)
from pose_estimation_tpu.core.precision import matmul as _mm

_EPS = 1e-9


def _minimal_subsets(key: jax.Array, n: int, num: int, num_subsets: int,
                     mask: jax.Array) -> jax.Array:
    """[num_subsets, num] indices, each subset DISTINCT points ~ mask==1.

    Duplicate points in a minimal EPnP subset make the control-point
    system rank-deficient, wasting the hypothesis — cv2.solvePnPRansac
    samples distinct points (the parity target, tools/trainer.py:423-427);
    with replacement at n=256/num=6 ~5.7% of hypotheses contained a
    duplicate. One shared random permutation of the valid points (random
    keys, invalid sunk to the end, single argsort) and subset h = the
    window [h*num, h*num+num) modulo n_valid: consecutive integers mod m
    are distinct whenever num <= m, so every subset is duplicate-free,
    and while n_valid >= num*num_subsets the subsets are DISJOINT —
    stratified coverage an independent per-hypothesis draw can't give.
    Replaces a per-hypothesis Gumbel top-k whose H sorts of n keys made
    the sampler ~30x the arithmetic of the EPnP solves it fed (measured
    62 ms -> see pnp_ransac caller — the eval program's hot stage)."""
    kperm, kstart = jax.random.split(key)
    g = jax.random.uniform(kperm, (n,), dtype=jnp.float32)
    perm = jnp.argsort(jnp.where(mask > 0, g, jnp.inf))  # valid first
    n_valid = jnp.maximum((mask > 0).sum(), num)
    # Window starts: h*num while the window fits inside the valid prefix
    # (disjoint, stratified); once windows would wrap, h*num mod n_valid
    # aliases onto only n_valid/gcd(num, n_valid) distinct subsets (e.g.
    # 48 valid -> 8 distinct of 64 requested), so wrapping hypotheses get
    # independent random starts instead — ~min(H, n_valid) distinct
    # subsets, each still duplicate-free (num consecutive positions mod
    # n_valid >= num).
    seq = jnp.arange(num_subsets) * num
    rand = jax.random.randint(kstart, (num_subsets,), 0, jnp.int32(2**31 - 1)
                              ) % n_valid
    starts = jnp.where(seq + num <= n_valid, seq, rand)
    pos = (starts[:, None] + jnp.arange(num)[None, :]) % n_valid
    return jnp.take(perm, pos, axis=0)


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size",
                                   "refine_iters", "robust_refine",
                                   "refine_top_k"))
def pnp_ransac(key: jax.Array, pw: jax.Array, uv: jax.Array, k: jax.Array,
               mask: jax.Array | None = None,
               num_hypotheses: int = 64, sample_size: int = 6,
               inlier_px: float = 2.0, refine_iters: int = 5,
               robust_refine: bool = False, refine_top_k: int = 1):
    # refine_iters=5 measured accuracy-equivalent to 10 (median rot err
    # 0.140 vs 0.144 deg on noisy+25%-outlier scenes); LM iterations are
    # the deepest sequential chain in the eval program.
    """Single instance RANSAC PnP. pw [n,3], uv [n,2], k [3,3], mask [n].

    refine_top_k > 1 LM-refines the K highest-scoring hypotheses (vmapped,
    so no extra sequential depth) and keeps the one with the lowest final
    weighted reprojection error — a multi-start guard against the inlier
    count picking a locally-poor basin under coordinate-map noise.

    Returns dict with r [3,3], t [3], pose6 [6], inliers [n] bool,
    mean_err (px MSE over inliers). vmap over instances for a batch.
    """
    n = pw.shape[0]
    if mask is None:
        mask = jnp.ones((n,), pw.dtype)
    mask = mask.astype(pw.dtype)

    subset_ids = _minimal_subsets(key, n, sample_size, num_hypotheses, mask)

    def hypothesis(ids):
        # Gather the minimal subset into a dense (sample_size, ...) problem:
        # running EPnP on the full n-point arrays with a 6-hot weight vector
        # would cost 40x more flops per hypothesis for identical output.
        # epnp_fast: the hypothesis stage is latency-bound on TPU (dozens of
        # tiny sequential kernels per solve), so hypotheses use the
        # minimal-kernel-count solver; the winner is LM-refined below.
        return epnp_fast(jnp.take(pw, ids, axis=0),
                         jnp.take(uv, ids, axis=0), k)

    rs, ts = jax.vmap(hypothesis)(subset_ids)

    # Score all hypotheses against all points.
    pc = jnp.einsum("hij,nj->hni", rs, pw,
                    precision=jax.lax.Precision.HIGHEST) + ts[:, None, :]
    z = jnp.maximum(pc[..., 2], 1e-8)
    proj_u = pc[..., 0] / z * k[0, 0] + k[0, 2]
    proj_v = pc[..., 1] / z * k[1, 1] + k[1, 2]
    err = jnp.sqrt((proj_u - uv[:, 0]) ** 2 + (proj_v - uv[:, 1]) ** 2)
    inl = (err < inlier_px) & (mask > 0) & (pc[..., 2] > 0)
    scores = inl.sum(-1)
    best = jnp.argmax(scores)

    def weights_for(idx):
        # Refine on the hypothesis's inliers; if degenerate (few inliers)
        # fall back to all masked points.
        w_inl = inl[idx].astype(pw.dtype)
        if robust_refine:
            # Cauchy reweighting over ALL masked points instead of the
            # hard 2px cut: every point contributes, downweighted smoothly
            # by its residual at the hypothesis — averages more of the
            # coordinate-map noise into the LM fit than a binary inlier
            # set.
            w_inl = mask / (1.0 + (err[idx] / inlier_px) ** 2)
        return jnp.where(scores[idx] >= sample_size, w_inl, mask)

    if refine_top_k <= 1:
        pose0 = jnp.concatenate([matrix_to_axis_angle(rs[best]), ts[best]])
        pose, mse = refine_pose_lm(pose0, pw, uv, k, weights_for(best),
                                   iters=refine_iters)
    else:
        _, top = jax.lax.top_k(scores, refine_top_k)

        def refine_one(idx):
            p0 = jnp.concatenate([matrix_to_axis_angle(rs[idx]), ts[idx]])
            return refine_pose_lm(p0, pw, uv, k, weights_for(idx),
                                  iters=refine_iters)

        poses, _ = jax.vmap(refine_one)(top)
        # Rank refined candidates by a COMMON objective (their own per-run
        # weights differ): robust Cauchy-weighted reprojection error over
        # the masked points.
        def common_cost(p):
            res = reprojection_residuals(p, pw, uv, k).reshape(-1, 2)
            e2 = jnp.sum(res * res, -1)
            rho = jnp.log1p(e2 / (inlier_px * inlier_px))
            return (mask * rho).sum()

        costs = jax.vmap(common_cost)(poses)
        win = jnp.argmin(costs)
        pose = poses[win]
        res = reprojection_residuals(pose, pw, uv, k).reshape(-1, 2)
        w_win = weights_for(top[win])
        mse = (w_win * jnp.sum(res * res, -1)).sum() / jnp.maximum(
            w_win.sum(), 1e-12)

    # Final inlier set at the refined pose.
    res = reprojection_residuals(pose, pw, uv, k).reshape(-1, 2)
    final_err = jnp.linalg.norm(res, axis=-1)
    final_inl = (final_err < inlier_px) & (mask > 0)

    return {
        "r": axis_angle_to_matrix(pose[:3]),
        "t": pose[3:],
        "pose6": pose,
        "inliers": final_inl,
        "mean_err": mse,
        "num_inliers": final_inl.sum(),
    }


def pnp_ransac_batch(key: jax.Array, pw: jax.Array, uv: jax.Array,
                     k: jax.Array, mask: jax.Array | None = None, **kw):
    """Batched RANSAC PnP: pw [b,n,3], uv [b,n,2], k [b,3,3] or [3,3]."""
    b = pw.shape[0]
    keys = jax.random.split(key, b)
    if k.ndim == 2:
        k = jnp.broadcast_to(k, (b, 3, 3))
    if mask is None:
        mask = jnp.ones(pw.shape[:2], pw.dtype)
    return jax.vmap(lambda kk, p, u, km, m: pnp_ransac(kk, p, u, km, m, **kw))(
        keys, pw, uv, k, mask)


# ---------------------------------------------------------------------------
# Differentiable PnP via the implicit function theorem (BPnP generalization)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def pnp_implicit(pose6: jax.Array, pw: jax.Array, uv: jax.Array,
                 k: jax.Array, weights: jax.Array) -> jax.Array:
    """Identity on a (refined) pose that is a stationary point of the
    weighted reprojection objective; gradients to (pw, uv, k) flow through
    the implicit function theorem. Use as:

        pose = pnp_ransac(...)["pose6"]            # non-diff solver
        pose = pnp_implicit(pose, pw, uv, k, w)    # attach gradients

    Replaces BPnP.backward (lib/network/dnn/BPnP.py:53-117), which assembled
    J_fy / J_fx / J_fz / J_fK row-by-row with torch.autograd.grad; here the
    same quantities are two vjp calls against g = dE/dpose.
    """
    return pose6


def _objective_grad(pose6, pw, uv, k, weights):
    def energy(p, pw_, uv_, k_):
        res = reprojection_residuals(p, pw_, uv_, k_).reshape(-1, 2)
        return 0.5 * jnp.sum(weights[:, None] * res * res)
    return jax.grad(energy, argnums=0)(pose6, pw, uv, k)


def _pnp_fwd(pose6, pw, uv, k, weights):
    return pose6, (pose6, pw, uv, k, weights)


def _pnp_bwd(saved, gbar):
    pose6, pw, uv, k, weights = saved
    # g(pose; x) = dE/dpose = 0 at the solution.
    # dpose/dx = -(dg/dpose)^-1 dg/dx ; chain with gbar.
    hess = jax.jacfwd(_objective_grad, argnums=0)(pose6, pw, uv, k, weights)
    hess = hess + 1e-6 * jnp.eye(6, dtype=pose6.dtype)
    v = jnp.linalg.solve(hess.T, gbar)  # [6]
    _, vjp_x = jax.vjp(
        lambda pw_, uv_, k_: _objective_grad(pose6, pw_, uv_, k_, weights),
        pw, uv, k)
    gpw, guv, gk = vjp_x(-v)
    return (jnp.zeros_like(pose6), gpw, guv, gk, jnp.zeros_like(weights))


pnp_implicit.defvjp(_pnp_fwd, _pnp_bwd)
