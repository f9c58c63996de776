"""UNet backbone with shared trunk and per-task decoders (transparent gen).

Rebuild of version/transparent/lib/networks/unet.py: encoder 64-128-256-512
-512(bilinear), shared up1/up2, then separate up3/up4 decoders for color
(64ch), normal (64ch, L2-normalized) and depth (64ch). NOTE the reference
constructs dedicated `up*_nd/_n/_d` modules but its forward reuses the
color decoder for all three branches (unet.py:108-128); here each branch
genuinely has its own decoder — the intended architecture.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pose_estimation_tpu.models.layers import Norm, resize_bilinear


class DoubleConv(nn.Module):
    features: int
    mid: int | None = None
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid or self.features
        x = nn.Conv(mid, (3, 3), use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(Norm(self.norm, dtype=self.dtype)(x, train))
        x = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(x)
        return nn.relu(Norm(self.norm, dtype=self.dtype)(x, train))


class Down(nn.Module):
    features: int
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.features, norm=self.norm,
                          dtype=self.dtype)(x, train)


class Up(nn.Module):
    features: int
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = resize_bilinear(x1, x2.shape[1], x2.shape[2])
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.features, mid=x.shape[-1] // 2,
                          norm=self.norm, dtype=self.dtype)(x, train)


class UNet(nn.Module):
    """Returns (color_feat 64, normal_feat 64 L2-normalized, depth_feat 64),
    all at input resolution."""

    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = dict(norm=self.norm, dtype=self.dtype)
        x1 = DoubleConv(64, **d)(x, train)
        x2 = Down(128, **d)(x1, train)
        x3 = Down(256, **d)(x2, train)
        x4 = Down(512, **d)(x3, train)
        x5 = Down(512, **d)(x4, train)

        # color trunk
        c = Up(256, **d)(x5, x4, train)
        c = Up(128, **d)(c, x3, train)
        c = Up(64, **d)(c, x2, train)
        color = Up(64, **d)(c, x1, train)

        # shared normal/depth trunk, split decoders
        nd = Up(256, **d)(x5, x4, train)
        nd = Up(128, **d)(nd, x3, train)

        n = Up(64, **d)(nd, x2, train)
        normal = Up(64, **d)(n, x1, train)
        # safe_normalize, NOT norm+maximum: relu features are exactly
        # zero at all-negative pixels and the naive form's gradient is
        # NaN there — this single line wedged transparent training
        # (core/mathsafe.py has the full story)
        from pose_estimation_tpu.core.mathsafe import safe_normalize
        normal = safe_normalize(normal)

        dd = Up(64, **d)(nd, x2, train)
        depth = Up(64, **d)(dd, x1, train)
        return color, normal, depth
