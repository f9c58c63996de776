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
    (lib/transform/allocentric.py:15-45) — same rotation, but via the
    half-angle form q = normalize([1 + cam.obj, cam x obj]) instead of
    arccos + axis-angle. The arccos path has an inf derivative at the
    on-axis boundary and a 0/0 in the axis normalization, which poisoned
    every upstream gradient of the transparent pose loss once bf16 model
    outputs rounded the ray's z to exactly 1.0; the half-angle form is
    smooth everywhere with z > -1 (objects are in front of the camera).
    Computed in f32 regardless of input dtype — [...,3] is tiny.
    """
    t = translation.astype(jnp.float32)
    obj_ray = t / jnp.sqrt(jnp.sum(t * t, -1, keepdims=True) + eps * eps)
    cam_ray = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    w = 1.0 + obj_ray[..., 2:3]                  # 1 + dot(cam_ray, obj_ray)
    xyz = jnp.cross(jnp.broadcast_to(cam_ray, obj_ray.shape), obj_ray)
    q = jnp.concatenate([w, xyz], axis=-1)
    return q / jnp.sqrt(jnp.sum(q * q, -1, keepdims=True) + eps * eps)


def allo_to_ego_matrix(translation: jax.Array, rot_allo: jax.Array,
                       eps: float = 1e-4) -> jax.Array:
    """R_ego = R(allo->ego) @ R_allo. translation [..., 3], rot [..., 3, 3]."""
    rot_a2e = quat_to_matrix(_ray_quat(translation, eps))
    return _mm(rot_a2e, rot_allo.astype(rot_a2e.dtype)).astype(rot_allo.dtype)


def ego_to_allo_matrix(translation: jax.Array, rot_ego: jax.Array,
                       eps: float = 1e-4) -> jax.Array:
    """Inverse of allo_to_ego_matrix (lib/transform/allocentric.py:168-214)."""
    rot_a2e = quat_to_matrix(_ray_quat(translation, eps))
    return _mm(jnp.swapaxes(rot_a2e, -1, -2),
               rot_ego.astype(rot_a2e.dtype)).astype(rot_ego.dtype)
