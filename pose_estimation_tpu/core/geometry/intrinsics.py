"""Camera intrinsics utilities and differentiable backprojection.

Replaces lib/utils/utlis.py:12-34 (batch_intrinsic_transform) and
lib/transform/coordinate.py:91-101 (uvd2cloud), fully batched and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def intrinsic_vec_to_matrix(k_vec: jax.Array) -> jax.Array:
    """[..., 4] (fx, fy, cx, cy) -> [..., 3, 3] K matrix.

    Parity target: lib/utils/utlis.py:12-24.
    """
    fx, fy, cx, cy = k_vec[..., 0], k_vec[..., 1], k_vec[..., 2], k_vec[..., 3]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    rows = jnp.stack(
        [
            jnp.stack([fx, z, cx], -1),
            jnp.stack([z, fy, cy], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )
    return rows


def intrinsic_matrix_to_vec(k: jax.Array) -> jax.Array:
    """[..., 3, 3] K -> [..., 4] (fx, fy, cx, cy). lib/utils/utlis.py:27-34."""
    return jnp.stack(
        [k[..., 0, 0], k[..., 1, 1], k[..., 0, 2], k[..., 1, 2]], axis=-1
    )


def uvd_to_cloud(uvd: jax.Array, k: jax.Array) -> jax.Array:
    """Differentiable backprojection: pixel (u, v) + depth d -> camera XYZ.

    uvd: [..., N, 3]; k: [..., 3, 3] or [3, 3] (broadcast).
    Parity target: lib/transform/coordinate.py:91-101.
    """
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    fx, fy, cx, cy = (jnp.expand_dims(a, -1) for a in (fx, fy, cx, cy))
    x = (uvd[..., 0] - cx) * uvd[..., 2] / fx
    y = (uvd[..., 1] - cy) * uvd[..., 2] / fy
    return jnp.stack([x, y, uvd[..., 2]], axis=-1)


def depth_map_to_cloud(depth: jax.Array, k: jax.Array,
                       u0: jax.Array | float = 0.0,
                       v0: jax.Array | float = 0.0) -> jax.Array:
    """Backproject a full [H, W] (or [..., H, W]) depth map to [..., H, W, 3].

    (u0, v0) is the pixel coordinate of the map's top-left corner in the
    original full image (for crops). Mirrors the dataset backprojection
    dataset/linemod/batchdataset.py:714-721 (xmap/ymap * depth / K).
    """
    h, w = depth.shape[-2:]
    vmap_ = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + v0
    umap_ = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + u0
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    fx, fy, cx, cy = (jnp.expand_dims(jnp.expand_dims(a, -1), -1)
                      for a in (fx, fy, cx, cy))
    x = (umap_ - cx) * depth / fx
    y = (vmap_ - cy) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)


def project_points(points: jax.Array, k: jax.Array) -> jax.Array:
    """Perspective projection: camera XYZ [..., N, 3] -> pixel UV [..., N, 2].

    Counterpart of BPnP's batch_project (lib/network/dnn/BPnP.py:144-159),
    used by the PnP solver residuals.
    """
    z = jnp.maximum(points[..., 2:3], 1e-8)
    uv1 = points / z
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    fx, fy, cx, cy = (jnp.expand_dims(a, -1) for a in (fx, fy, cx, cy))
    u = uv1[..., 0] * fx + cx
    v = uv1[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1)


def crop_intrinsics(k: jax.Array, u0: jax.Array, v0: jax.Array,
                    scale: jax.Array | float = 1.0) -> jax.Array:
    """Adjust K for a crop whose top-left corner is (u0, v0), then resized
    by `scale`. Mirrors the adjusted-intrinsics logic of the resize dataset
    path (dataset/linemod/batchdataset.py:339-601, BathPoseDataset
    version/transparent/datasets/cleargrasp/dataset.py:760-770).
    """
    k = jnp.asarray(k, jnp.float32)
    new = k.at[..., 0, 2].add(-u0).at[..., 1, 2].add(-v0)
    s = jnp.asarray(scale, jnp.float32)
    return new.at[..., :2, :].multiply(s[..., None, None] if s.ndim else s)
