"""Pose regression heads.

Rebuild of lib/network/pose/posenet.py: TBase — per-point MLP
(1664+num_cls) -> 1024 -> 256 -> 256 -> 3 producing per-point translation
offsets (no pooling; the mean happens in KRRN: pred_t = (cloud + t_res)
.mean, krrn.py:153); RotBase — the (currently disabled, krrn.py:146-152)
global rotation-code head with average pooling over points. Both are kept so
the rotation path can be enabled by config, plus the FS-Net style
confidence-weighted orthogonalization utilities (lib/network/pose/
pose_utils.py:11-61) as pure functions.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pose_estimation_tpu.models.layers import MLP1d, Norm


class TBase(nn.Module):
    """Per-point translation offsets [B, N, out_dim] (posenet.py:51-81);
    out_dim = cfg.Module.POSENet.OUT_T."""

    norm: str = "gn"
    dropout: float = 0.2
    out_dim: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        x = MLP1d((1024, 256, 256), self.norm, final_act=True,
                  dtype=self.dtype)(feat, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


class RotBase(nn.Module):
    """Global rotation code [B, k] (posenet.py:19-48, disabled in KRRN)."""

    out_dim: int = 4
    norm: str = "gn"
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        x = MLP1d((1024, 256), self.norm, final_act=True,
                  dtype=self.dtype)(feat, train)
        x = jnp.mean(x, axis=1)  # AvgPool1d over points
        x = nn.Dense(256, dtype=self.dtype)(x)
        x = nn.relu(Norm(self.norm, dtype=self.dtype)(x, train))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


class PoseNet(nn.Module):
    """(rot_green, rot_red, t_res) triple; rotation heads optional
    (posenet.py:84-96 returns (None, None, t))."""

    enable_rot: bool = False
    rot_dim: int = 4                 # cfg.Module.POSENet.OUTC_R
    t_dim: int = 3                   # cfg.Module.POSENet.OUT_T
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        t = TBase(self.norm, out_dim=self.t_dim, dtype=self.dtype)(
            feat, train)
        if self.enable_rot:
            green = RotBase(self.rot_dim, self.norm, dtype=self.dtype)(
                feat, train)
            red = RotBase(self.rot_dim, self.norm, dtype=self.dtype)(
                feat, train)
            return green, red, t
        return None, None, t


def vertical_rot_vectors(c1, c2, v1, v2, eps=1e-8):
    """Confidence-weighted orthogonalization of two rotation axes.

    FS-Net trick (lib/network/pose/pose_utils.py:11-42): rotate each vector
    toward the plane orthogonal to the other, proportionally to relative
    confidence. v1/v2 [B, 3] unit, c1/c2 [B, 1]. Returns (new_y, new_x).
    """
    dot = jnp.sum(v1 * v2, axis=-1, keepdims=True)
    w1 = c1 / jnp.maximum(c1 + c2, eps)
    w2 = c2 / jnp.maximum(c1 + c2, eps)
    # move each vector away from the other by its share of the angle error
    v1_new = v1 - w2 * dot * v2
    v2_new = v2 - w1 * dot * v1
    from pose_estimation_tpu.core.mathsafe import safe_normalize
    v1_new = safe_normalize(v1_new, eps=eps)
    v2_new = safe_normalize(v2_new, eps=eps)
    return v1_new, v2_new


def rot_mat_y_first(y, x, eps=1e-8):
    """Rotation matrix from y (first) and x axes
    (lib/network/pose/pose_utils.py:45-53)."""
    from pose_estimation_tpu.core.mathsafe import safe_normalize
    z = jnp.cross(x, y)
    z = safe_normalize(z, eps=eps)
    x_new = jnp.cross(y, z)
    return jnp.stack([x_new, y, z], axis=-1)
