"""Allocentric <-> egocentric rotation conversion, pure JAX.

Replaces lib/transform/allocentric.py (GDR-Net style): the allocentric
(viewpoint-invariant) rotation is related to the egocentric (camera-frame)
rotation by the rotation that takes the optical axis onto the ray through the
object center. Differentiable and batched; used by the transparent pipeline's
pose loss (version/transparent/lib/networks/loss.py:212).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pose_estimation_tpu.core.geometry.rotations import quat_to_matrix
from pose_estimation_tpu.core.precision import matmul as _mm


def _ray_quat(translation: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Quaternion rotating cam ray (0,0,1) onto the ray through `translation`.

    translation: [..., 3]. Parity: allo_to_ego_mat_torch
    (lib/transform/allocentric.py:15-45), including its eps regularization.
    """
    obj_ray = translation / (jnp.linalg.norm(translation, axis=-1, keepdims=True) + eps)
    angle = jnp.arccos(jnp.clip(obj_ray[..., 2:3], -1.0, 1.0))
    cam_ray = jnp.array([0.0, 0.0, 1.0], dtype=translation.dtype)
    axis = jnp.cross(jnp.broadcast_to(cam_ray, obj_ray.shape), obj_ray)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + eps)
    half = angle / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def allo_to_ego_matrix(translation: jax.Array, rot_allo: jax.Array,
                       eps: float = 1e-4) -> jax.Array:
    """R_ego = R(allo->ego) @ R_allo. translation [..., 3], rot [..., 3, 3]."""
    rot_a2e = quat_to_matrix(_ray_quat(translation, eps))
    return _mm(rot_a2e, rot_allo)


def ego_to_allo_matrix(translation: jax.Array, rot_ego: jax.Array,
                       eps: float = 1e-4) -> jax.Array:
    """Inverse of allo_to_ego_matrix (lib/transform/allocentric.py:168-214)."""
    rot_a2e = quat_to_matrix(_ray_quat(translation, eps))
    return _mm(jnp.swapaxes(rot_a2e, -1, -2), rot_ego)
