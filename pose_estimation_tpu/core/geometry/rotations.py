"""Pure-JAX rotation representation conversions.

Replaces the reference's external native geometry deps — kornia
(tools/trainer.py:433-435, lib/utils/metric.py:70-72) and transforms3d
(lib/transform/allocentric.py:10-12) — with jit-compatible, batched, fully
differentiable conversions. All functions accept arbitrary leading batch
dimensions and are safe under vmap/grad.

Conventions:
  - quaternions are (w, x, y, z), unit norm assumed unless noted
  - rotation matrices are (..., 3, 3) acting on column vectors: x' = R @ x
  - axis-angle ("rotation vector") is (..., 3) with angle = |v|, axis = v/|v|
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pose_estimation_tpu.core.precision import matmul as _mm, einsum as _einsum

_EPS = 1e-8


def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) to unit norm, sign-canonicalized to w >= 0.

    The clamp goes INSIDE the sqrt: `maximum(norm(q), eps)` still
    backprops through norm, whose gradient at q == 0 is 0/0 = NaN, and
    `where/maximum` propagate NaN from the unselected branch (the same
    trap fixed in axis_angle_to_matrix). sqrt(max(|q|^2, eps^2)) has a
    finite gradient everywhere — a regression-head quat underflowing to
    exactly 0 was one source of the transparent step's intermittent
    skipped_nonfinite guard hits."""
    sq = jnp.sum(q * q, axis=-1, keepdims=True)
    q = q / jnp.sqrt(jnp.maximum(sq, _EPS * _EPS))
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """(w,x,y,z) quaternion -> (..., 3, 3) rotation matrix.

    Parity target: kornia.quaternion_to_rotation_matrix /
    lib/transform/allocentric.py:48-96 (quat2mat_torch).
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (w,x,y,z) quaternion.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the one keyed by the largest diagonal combination (numerically
    stable everywhere, jit/vmap-safe — no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidates, each valid when its pivot is the max.
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)

    pivots = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
         1 - m00 + m11 - m22, 1 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    return quat_normalize(q)


def axis_angle_to_matrix(v: jax.Array) -> jax.Array:
    """Rotation vector (..., 3) -> matrix via Rodrigues.

    Parity target: kornia.angle_axis_to_rotation_matrix as used for
    cv2.solvePnPRansac rvec decoding (tools/trainer.py:433-435).
    Taylor-safe near angle=0.
    """
    angle_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    small = angle_sq < 1e-12
    # Both branches of the select must be NaN-free in value AND gradient
    # (jnp.where propagates NaNs from the unselected branch), so the exact
    # branch is evaluated at a "safe" angle where the input is tiny.
    angle = jnp.sqrt(jnp.where(small, 1.0, angle_sq))
    axis = v / angle
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    K = skew(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    R_exact = eye + s * K + (1 - c) * _mm(K, K)
    # 1st-order expansion for tiny angles keeps gradients finite at v = 0.
    R_taylor = eye + skew(v)
    return jnp.where(small[..., None], R_taylor, R_exact)


def matrix_to_axis_angle(m: jax.Array) -> jax.Array:
    """Matrix -> rotation vector, via quaternion (stable near 0 and pi)."""
    q = matrix_to_quat(m)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    n = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(n[..., 0], w)
    scale = jnp.where(n[..., 0] < _EPS, 2.0, angle / jnp.maximum(n[..., 0], _EPS))
    return xyz * scale[..., None]


def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], -1),
        ],
        axis=-2,
    )


def ortho6d_to_matrix(poses: jax.Array) -> jax.Array:
    """6-D continuous rotation representation -> matrix (Zhou et al. CVPR'19).

    Parity target: lib/transform/coordinate.py:130-145 (ortho6d_to_mat_batch):
    columns x_raw = poses[..., 0:3], y_raw = poses[..., 3:6]; Gram-Schmidt.
    """
    x_raw = poses[..., 0:3]
    y_raw = poses[..., 3:6]
    from pose_estimation_tpu.core.mathsafe import safe_normalize
    x = safe_normalize(x_raw, eps=_EPS)
    z = jnp.cross(x, y_raw)
    z = safe_normalize(z, eps=_EPS)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns


def matrix_to_ortho6d(m: jax.Array) -> jax.Array:
    """Matrix -> 6-D representation (first two columns, flattened)."""
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


def euler_to_matrix(angles: jax.Array, order: str = "xyz") -> jax.Array:
    """Intrinsic Euler angles (radians) -> rotation matrix.

    Replaces transforms3d.euler usage in the reference's dataset augmentation
    (version/transparent/lib/transform/rotation.py).
    """
    def rot_x(a):
        c, s = jnp.cos(a), jnp.sin(a)
        z, o = jnp.zeros_like(a), jnp.ones_like(a)
        return jnp.stack(
            [jnp.stack([o, z, z], -1), jnp.stack([z, c, -s], -1), jnp.stack([z, s, c], -1)], -2)

    def rot_y(a):
        c, s = jnp.cos(a), jnp.sin(a)
        z, o = jnp.zeros_like(a), jnp.ones_like(a)
        return jnp.stack(
            [jnp.stack([c, z, s], -1), jnp.stack([z, o, z], -1), jnp.stack([-s, z, c], -1)], -2)

    def rot_z(a):
        c, s = jnp.cos(a), jnp.sin(a)
        z, o = jnp.zeros_like(a), jnp.ones_like(a)
        return jnp.stack(
            [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)], -2)

    rots = {"x": rot_x, "y": rot_y, "z": rot_z}
    m = rots[order[0]](angles[..., 0])
    for i, ax in enumerate(order[1:], start=1):
        m = _mm(m, rots[ax](angles[..., i]))
    return m


def angular_distance(r1: jax.Array, r2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Geodesic angle (degrees) between rotation matrices.

    Parity target: lib/utils/metric.py:67-80 (angular_distance via quaternions
    with clamped acos). Uses the trace formula with the same clamping.
    """
    cos = (jnp.einsum("...ii->...", _mm(r1, jnp.swapaxes(r2, -1, -2))) - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0 + eps, 1.0 - eps)
    return jnp.degrees(jnp.arccos(cos))


def random_rotation(key: jax.Array, shape: tuple = ()) -> jax.Array:
    """Uniform random rotation matrices (..., 3, 3) via random unit quats."""
    q = jax.random.normal(key, shape + (4,))
    return quat_to_matrix(quat_normalize(q))


def transform_points(points: jax.Array, r: jax.Array, t: jax.Array) -> jax.Array:
    """Apply rigid transform: points (..., N, 3), r (..., 3, 3), t (..., 3).

    Matches the reference's row-vector convention
    `model_points @ pred_r.T + pred_t` (lib/network/loss.py:26).
    """
    return _mm(points, jnp.swapaxes(r, -1, -2)) + t[..., None, :]
