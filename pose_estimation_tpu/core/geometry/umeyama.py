"""Batched, differentiable Kabsch / Umeyama rigid & similarity alignment.

Replaces lib/transform/umeyama.py + lib/transform/trans.py (numpy RANSAC
similarity used by the standalone eval, tools/script/eval.py:28,151) and the
transparent pipeline's declarative least-squares layer
(version/transparent/lib/declarative/leastsquares.py:10-127), whose backward
was a hand-rolled implicit differentiation of the stationarity conditions.
On TPU we solve the orthogonal Procrustes problem by SVD; gradients flow
through jnp.linalg.svd's analytic VJP, so no custom backward machinery is
needed. Weighted variants support masked fixed-shape RANSAC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pose_estimation_tpu.core.precision import matmul as _mm, einsum as _einsum


def kabsch(src: jax.Array, dst: jax.Array, weights: jax.Array | None = None,
           with_scale: bool = False):
    """Best-fit transform dst ~ scale * R @ src + t  (least squares).

    src, dst: [..., N, 3]; weights: [..., N] nonneg (optional mask).
    Returns (R [..., 3, 3], t [..., 3], scale [...]).

    Parity: best_batch_fit_transform (leastsquares.py:10-48) for rigid;
    estimateSimilarityUmeyama (umeyama.py:45-78) when with_scale=True.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = weights / jnp.maximum(weights.sum(-1, keepdims=True), 1e-8)
    mu_s = (w[..., None] * src).sum(-2)
    mu_d = (w[..., None] * dst).sum(-2)
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    # Weighted cross-covariance (3x3).
    cov = _einsum("...n,...ni,...nj->...ij", w, dc, sc)
    u, s, vt = jnp.linalg.svd(cov)
    # Reflection fix: det(U @ Vt) must be +1.
    det = jnp.linalg.det(_mm(u, vt))
    d = jnp.concatenate(
        [jnp.ones(det.shape + (2,), src.dtype), det[..., None]], axis=-1)
    r = _mm(u * d[..., None, :], vt)
    if with_scale:
        var_s = (w * (sc ** 2).sum(-1)).sum(-1)
        scale = (s * d).sum(-1) / jnp.maximum(var_s, 1e-12)
    else:
        scale = jnp.ones(det.shape, src.dtype)
    t = mu_d - scale[..., None] * _einsum("...ij,...j->...i", r, mu_s)
    return r, t, scale


def umeyama_ransac(key: jax.Array, src: jax.Array, dst: jax.Array,
                   num_hypotheses: int = 128, sample_size: int = 4,
                   inlier_thresh: float = 0.01, with_scale: bool = True):
    """Fixed-shape vectorized RANSAC similarity alignment.

    Replaces the python-loop RANSAC of estimateSimilarityTransform
    (lib/transform/umeyama.py:8-43): all hypotheses are drawn and scored in
    one vmapped batch, then the best is refit on its inliers — a single
    compiled program, no data-dependent loop count.

    src, dst: [N, 3]. Returns (R, t, scale, inlier_mask).
    """
    n = src.shape[0]
    idx = jax.random.randint(key, (num_hypotheses, sample_size), 0, n)

    def fit(ids):
        r, t, s = kabsch(src[ids], dst[ids], with_scale=with_scale)
        return r, t, s

    rs, ts, ss = jax.vmap(fit)(idx)
    pred = ss[:, None, None] * _einsum("hij,nj->hni", rs, src) + ts[:, None, :]
    err = jnp.linalg.norm(pred - dst[None], axis=-1)  # [h, n]
    inlier = err < inlier_thresh
    scores = inlier.sum(-1)
    best = jnp.argmax(scores)
    best_inlier = inlier[best]
    # Refit on inliers (weighted so shape stays static).
    w = best_inlier.astype(src.dtype)
    r, t, s = kabsch(src, dst, weights=w + 1e-6, with_scale=with_scale)
    return r, t, s, best_inlier
