"""Batched EPnP (Efficient Perspective-n-Point) in pure JAX.

Replaces the reference's CPU OpenCV calls `cv2.solvePnPRansac(...,
SOLVEPNP_EPNP)` (tools/trainer.py:423-427, tools/script/eval.py:131-135,
lib/utils/utlis.py:59-63) with a fixed-shape, jit/vmap-safe implementation so
pose recovery runs on-device inside the same compiled program as the model.

Algorithm (Lepetit et al., IJCV'09), the same one OpenCV implements:
  1. 4 control points = centroid + 3 PCA axes of the world points
  2. barycentric coordinates of every world point in the control basis
  3. M x = 0 (2n x 12) from the projection equations; null-space basis from
     the 4 smallest eigenvectors of M^T M (12 x 12 eigh)
  4. betas from inter-control-point distance constraints (cases N=1 and N=2),
     then Gauss-Newton refinement of all 4 betas
  5. pose from Kabsch alignment of world to camera control points, with a
     cheirality (positive-depth) sign fix; best beta case wins by
     reprojection error.

Weighted by a per-point mask throughout so RANSAC minimal subsets and padded
batches are static-shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.core.geometry.umeyama import kabsch
from pose_estimation_tpu.core.geometry.intrinsics import project_points
from pose_estimation_tpu.core.precision import einsum as _einsum, matmul as _mm

_EPS = 1e-9

# Index pairs of the 6 distances among 4 control points. numpy, not jnp:
# a module-level device constant gets re-fetched D2H during every jit
# lowering that captures it — through the axon relay that fetch queues
# behind device work (measured 0.8 s inside infer_pose's lowering).
_PAIRS = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])


def _control_points(pw: jax.Array, w: jax.Array) -> jax.Array:
    """Centroid + principal axes control points. pw [n,3], w [n] -> [4,3]."""
    wsum = jnp.maximum(w.sum(), _EPS)
    c = (w[:, None] * pw).sum(0) / wsum
    centered = (pw - c) * jnp.sqrt(w)[:, None]
    cov = _mm(centered.T, centered) / wsum
    eigval, eigvec = jnp.linalg.eigh(cov)  # ascending
    # scale axes by sqrt of eigenvalue (OpenCV convention), guard degenerate
    s = jnp.sqrt(jnp.maximum(eigval, 1e-12))
    axes = eigvec.T * s[:, None]  # rows
    return jnp.concatenate([c[None], c[None] + axes], axis=0)


def _barycentric(pw: jax.Array, ctrl: jax.Array) -> jax.Array:
    """Barycentric coords [n, 4] s.t. pw = alpha @ ctrl, sum(alpha) = 1."""
    # Solve [ctrl^T; 1] alpha = [pw; 1]
    ct = jnp.concatenate([ctrl.T, jnp.ones((1, 4), pw.dtype)], axis=0)  # 4x4
    rhs = jnp.concatenate([pw.T, jnp.ones((1, pw.shape[0]), pw.dtype)], axis=0)
    alpha = jnp.linalg.solve(ct + _EPS * jnp.eye(4, dtype=pw.dtype), rhs)
    return alpha.T


def _build_mtm(alpha: jax.Array, uv: jax.Array, k: jax.Array,
               w: jax.Array) -> jax.Array:
    """M^T M (12x12) accumulated directly — M (2n x 12) never materializes
    per-row pairs; rows are formed batched then contracted on the MXU."""
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    n = alpha.shape[0]
    zeros = jnp.zeros((n, 4), alpha.dtype)
    du = (cx - uv[:, 0])[:, None] * alpha  # n x 4
    dv = (cy - uv[:, 1])[:, None] * alpha
    # row_u: [fx*a | 0 | (cx-u)*a] interleaved as 12 = 4 ctrl x 3 coords
    # layout: columns grouped per control point (x_j, y_j, z_j).
    row_u = jnp.stack([fx * alpha, zeros, du], axis=-1).reshape(n, 12)
    row_v = jnp.stack([zeros, fy * alpha, dv], axis=-1).reshape(n, 12)
    mtm = (_einsum("ni,nj->ij", w[:, None] * row_u, row_u)
           + _einsum("ni,nj->ij", w[:, None] * row_v, row_v))
    return mtm


def _rho(ctrl_w: jax.Array) -> jax.Array:
    """Squared distances between world control points [6]."""
    d = ctrl_w[_PAIRS[:, 0]] - ctrl_w[_PAIRS[:, 1]]
    return jnp.sum(d * d, axis=-1)


def _vk_pair_diffs(vk: jax.Array) -> jax.Array:
    """vk [4 (basis), 4 (ctrl), 3] -> pair differences [4, 6, 3]."""
    return vk[:, _PAIRS[:, 0]] - vk[:, _PAIRS[:, 1]]


def _betas_case1(dv: jax.Array, rho: jax.Array) -> jax.Array:
    """x = b1 * v1. dv: [4, 6, 3]."""
    d1 = jnp.sum(dv[0] * dv[0], axis=-1)
    # least squares: b1^2 * d1 = rho  => b1 = sqrt(<rho,d1>/<d1,d1>)
    b1 = jnp.sqrt(jnp.maximum(jnp.sum(rho * d1) / jnp.maximum(
        jnp.sum(d1 * d1), _EPS), _EPS))
    return jnp.array([1.0, 0.0, 0.0, 0.0]) * b1


def _betas_case2(dv: jax.Array, rho: jax.Array) -> jax.Array:
    """x = b1 v1 + b2 v2: solve for (b11, b12, b22) then recover signs."""
    d1, d2 = dv[0], dv[1]
    a = jnp.stack(
        [jnp.sum(d1 * d1, -1), 2 * jnp.sum(d1 * d2, -1), jnp.sum(d2 * d2, -1)],
        axis=-1)  # [6, 3]
    sol = jnp.linalg.lstsq(a, rho)[0]
    b11, b12, b22 = sol[0], sol[1], sol[2]
    b1 = jnp.sqrt(jnp.maximum(jnp.abs(b11), _EPS))
    b2 = jnp.sqrt(jnp.maximum(jnp.abs(b22), _EPS)) * jnp.sign(b12) * jnp.sign(b11)
    return jnp.array([0.0, 0.0, 0.0, 0.0]).at[0].set(b1).at[1].set(b2)


def _gauss_newton_betas(betas: jax.Array, vk: jax.Array, rho: jax.Array,
                        iters: int = 8) -> jax.Array:
    """Refine 4 betas on the 6 control-distance residuals (OpenCV does 5)."""
    dv = _vk_pair_diffs(vk)  # [4, 6, 3]

    def residual(b):
        x = _einsum("k,kpc->pc", b, dv)  # [6, 3]
        return jnp.sum(x * x, axis=-1) - rho

    def step(b, _):
        r = residual(b)
        j = jax.jacfwd(residual)(b)  # [6, 4]
        jtj = _mm(j.T, j) + 1e-9 * jnp.eye(4)
        delta = jnp.linalg.solve(jtj, _mm(j.T, r[:, None]))[:, 0]
        return b - delta, None

    betas, _ = jax.lax.scan(step, betas, None, length=iters)
    return betas


def _pose_from_betas(betas: jax.Array, vk: jax.Array, alpha: jax.Array,
                     pw: jax.Array, w: jax.Array):
    """Camera control points -> per-point camera coords -> Kabsch pose."""
    ctrl_cam = _einsum("k,kcj->cj", betas, vk)  # [4, 3]
    pc = _mm(alpha, ctrl_cam)  # [n, 3] camera-frame points
    # cheirality: weighted mean depth must be positive
    depth = (w * pc[:, 2]).sum() / jnp.maximum(w.sum(), _EPS)
    pc = pc * jnp.sign(depth)
    r, t, _ = kabsch(pw, pc, weights=w)
    return r, t


def _smallest_eigvecs_inverse(mtm: jax.Array, k: int = 4,
                              iters: int = 8) -> jax.Array:
    """k eigenvectors of the smallest eigenvalues of a 12x12 PSD matrix via
    block INVERSE iteration: one Cholesky factorization + a few
    solve-and-orthogonalize rounds. Inverse iteration amplifies the small
    eigenvalues by 1/(lambda + eps), giving strong subspace separation in
    few rounds — all dense 12x12/12x4 ops, far cheaper on the MXU than
    jnp.linalg.eigh's iterative QR algorithm, which dominated the vmapped
    RANSAC hypothesis stage on TPU. (A trace-shifted block POWER iteration
    was tried first and does not converge: the shift flattens the spectrum.)

    Returns [12, k] orthonormal columns, ascending eigenvalue order.
    """
    n = mtm.shape[0]
    eps = 1e-6 * (jnp.trace(mtm) / n + 1e-12)
    a = mtm + eps * jnp.eye(n, dtype=mtm.dtype)
    chol = jnp.linalg.cholesky(a)
    q = jnp.eye(n, dtype=mtm.dtype)[:, :k] + 0.01

    def body(q, _):
        z = jax.scipy.linalg.cho_solve((chol, True), q)
        q, _ = jnp.linalg.qr(z)
        return q, None

    q, _ = jax.lax.scan(body, q, None, length=iters)
    ray = jnp.einsum("ik,ij,jk->k", q, mtm, q,
                     precision=jax.lax.Precision.HIGHEST)
    order = jnp.argsort(ray)
    return jnp.take(q, order, axis=1)


def _control_points_fast(pw: jax.Array) -> jax.Array:
    """Axis-aligned control points: centroid + per-axis std. Skips the
    3x3 PCA eigh — fine for RANSAC hypotheses whose pose is LM-refined."""
    c = pw.mean(0)
    s = jnp.maximum(pw.std(0), 1e-6)
    return jnp.concatenate([c[None], c[None] + jnp.diag(s)], axis=0)


def _gram_schmidt(q: jax.Array) -> jax.Array:
    """Orthonormalize the columns of a tall [n, 4] block — pure arithmetic
    (no Householder loops like jnp.linalg.qr lowers to)."""
    cols = []
    for i in range(q.shape[1]):
        v = q[:, i]
        for u in cols:
            v = v - jnp.dot(u, v, precision=jax.lax.Precision.HIGHEST) * u
        cols.append(v / jnp.maximum(jnp.linalg.norm(v), 1e-12))
    return jnp.stack(cols, axis=1)


def _chol_orthonormalize(q: jax.Array) -> jax.Array:
    """Orthonormalize [n, k] columns via Cholesky of the Gram matrix:
    Q_out = Q L^-T with G = Q^T Q = L L^T, so Q_out^T Q_out = I. Three
    kernels (gram matmul, 4x4 cholesky, triangular solve) instead of
    Gram-Schmidt's ~k^2 sequential dots — the RANSAC hypothesis stage is
    latency-bound on kernel count, not flops."""
    g = _mm(q.T, q)
    g = g + 1e-12 * jnp.trace(g) * jnp.eye(g.shape[0], dtype=q.dtype)
    l = jnp.linalg.cholesky(g)
    return jax.scipy.linalg.solve_triangular(l, q.T, lower=True).T


def _smallest_eigvecs_fast(mtm: jax.Array, k: int = 4,
                           iters: int = 2) -> jax.Array:
    # iters=2 measured accuracy-equivalent to 4 on noisy/outlier RANSAC
    # scenes (median rot err 0.143 vs 0.144 deg) at half the kernel depth
    # — the hypothesis stage is latency-bound.
    """Unrolled inverse iteration with Gram-Schmidt orthogonalization —
    the minimal-kernel-count variant for the RANSAC hypothesis stage."""
    n = mtm.shape[0]
    eps = 1e-6 * (jnp.trace(mtm) / n + 1e-12)
    chol = jnp.linalg.cholesky(mtm + eps * jnp.eye(n, dtype=mtm.dtype))
    # NOTE: a Cholesky-of-Gram orthonormalization (_chol_orthonormalize)
    # was measured SLOWER here (22.4 vs 16.3 ms for the b=32 h=32 RANSAC):
    # tiny batched cholesky/triangular-solve lower poorly on TPU vs
    # unrolled dots. Keep Gram-Schmidt.
    q = jnp.eye(n, dtype=mtm.dtype)[:, :k] + 0.01
    for _ in range(iters):
        q = _gram_schmidt(jax.scipy.linalg.cho_solve((chol, True), q))
    ray = jnp.einsum("ik,ij,jk->k", q, mtm, q,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.take(q, jnp.argsort(ray), axis=1)


def _gauss_newton_betas_fast(betas: jax.Array, dv: jax.Array,
                             rho: jax.Array, iters: int = 3) -> jax.Array:
    """Unrolled GN on the 6 distance residuals with the ANALYTIC jacobian
    dr_p/db_k = 2 <x_p, dv_kp> (no jacfwd machinery)."""
    for _ in range(iters):
        x = _einsum("k,kpc->pc", betas, dv)            # [6, 3]
        r = jnp.sum(x * x, axis=-1) - rho              # [6]
        j = 2.0 * _einsum("pc,kpc->pk", x, dv)         # [6, 4]
        jtj = _mm(j.T, j) + 1e-9 * jnp.eye(4)
        betas = betas - jnp.linalg.solve(jtj, _mm(j.T, r[:, None]))[:, 0]
    return betas


def epnp_fast(pw: jax.Array, uv: jax.Array, k: jax.Array):
    """Hypothesis-grade EPnP: beta case 1 only, axis-aligned control
    points, unrolled inverse iteration + analytic GN — ~10x fewer kernels
    than the full solver. Intended for RANSAC minimal subsets whose winner
    is LM-refined on the inliers (core/solvers/pnp.py); accuracy of each
    individual hypothesis matters less than wall-clock per hypothesis."""
    n = pw.shape[0]
    w = jnp.ones((n,), pw.dtype)
    ctrl_w = _control_points_fast(pw)
    alpha = _barycentric(pw, ctrl_w)
    mtm = _build_mtm(alpha, uv, k, w)
    vk = _smallest_eigvecs_fast(mtm, 4).T.reshape(4, 4, 3)
    rho = _rho(ctrl_w)
    dv = _vk_pair_diffs(vk)
    betas = _gauss_newton_betas_fast(_betas_case1(dv, rho), dv, rho)
    return _pose_from_betas(betas, vk, alpha, pw, w)


def epnp(pw: jax.Array, uv: jax.Array, k: jax.Array,
         weights: jax.Array | None = None,
         null_basis: str = "iterative"):
    """Single-instance EPnP. pw [n, 3] world points, uv [n, 2] pixels,
    k [3, 3]; weights [n] optional mask. Returns (R [3,3], t [3]).

    vmap over the leading axis for batches / RANSAC hypothesis sets.
    """
    n = pw.shape[0]
    w = jnp.ones((n,), pw.dtype) if weights is None else weights
    w = w / jnp.maximum(w.sum(), _EPS) * n  # keep scale ~1 per point

    ctrl_w = _control_points(pw, w)
    alpha = _barycentric(pw, ctrl_w)
    mtm = _build_mtm(alpha, uv, k, w)
    if null_basis == "iterative":
        eigvec = _smallest_eigvecs_inverse(mtm, 4)
    else:  # 'eigh' reference path
        eigvec = jnp.linalg.eigh(mtm)[1][:, :4]
    vk = eigvec[:, :4].T.reshape(4, 4, 3)  # [basis k, ctrl point, xyz]

    rho = _rho(ctrl_w)
    candidates = [
        _gauss_newton_betas(_betas_case1(_vk_pair_diffs(vk), rho), vk, rho),
        _gauss_newton_betas(_betas_case2(_vk_pair_diffs(vk), rho), vk, rho),
    ]

    def score(rt):
        r, t = rt
        proj = project_points(_mm(pw, r.T) + t, k)
        err = jnp.sum((proj - uv) ** 2, axis=-1)
        return (w * err).sum()

    poses = [_pose_from_betas(b, vk, alpha, pw, w) for b in candidates]
    errs = jnp.stack([score(p) for p in poses])
    best = jnp.argmin(errs)
    rs = jnp.stack([p[0] for p in poses])
    ts = jnp.stack([p[1] for p in poses])
    return rs[best], ts[best]
