"""TRPESNet — transparent-object pose network (UNet generation).

Rebuild of version/transparent/lib/networks/TRPES.py:206-283:
UNet backbone -> normal/depth/mask completion heads; GeometryNet lifts the
predicted-depth feature map to per-channel 3D points via intrinsics
(TRPES.py:24-51); DenseFusion concatenates color + per-axis geometry
embeddings with a global average-pooled feature (1792 = 256+512+1024,
TRPES.py:54-94); per-point quaternion/translation/confidence heads with
per-object output channels and batch gather (TRPES.py:154-203), plus the
TransformerEncoderLayer variant (TRPES.py:97-151 / attention.py).

TPU notes: NHWC; the per-object head channel gather is a one-hot einsum;
the random `choose` (TRPES.py:261-262 uses one randperm over all pixels)
comes from a flax RNG stream, strided-deterministic in eval.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pose_estimation_tpu.models.layers import MLP1d, Norm
from pose_estimation_tpu.models.unet import UNet


class TransformerEncoderBlock(nn.Module):
    """Pre-norm-free torch-style encoder layer (attention.py:18-117):
    self-attention + FFN with residuals and LayerNorms after each."""

    d_model: int
    nhead: int
    dim_ff: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            dtype=self.dtype)(x, x)
        x = nn.LayerNorm(dtype=self.dtype)(x + att)
        ff = nn.Dense(self.dim_ff, dtype=self.dtype)(x)
        ff = nn.Dense(self.d_model, dtype=self.dtype)(nn.relu(ff))
        return nn.LayerNorm(dtype=self.dtype)(x + ff)


class GeometryNet(nn.Module):
    """Feature map -> per-channel pseudo point cloud (TRPES.py:24-51):
    dx = relu(conv1x1(feat)) * d_scale treated as depths, backprojected per
    channel with the crop's pixel-coordinate maps."""

    channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, intrinsic, xmap, ymap, d_scale):
        # feat [B,H,W,C_in] -> dx [B,H,W,channels]
        dx = nn.relu(nn.Conv(self.channels, (1, 1), dtype=self.dtype)(feat))
        dx = dx * d_scale[:, None, None, None]
        fx = intrinsic[:, 0][:, None, None, None]
        fy = intrinsic[:, 1][:, None, None, None]
        cx = intrinsic[:, 2][:, None, None, None]
        cy = intrinsic[:, 3][:, None, None, None]
        u = xmap[..., None]
        v = ymap[..., None]
        pt0 = (u - cx) * dx / fx
        pt1 = (v - cy) * dx / fy
        # [B, H, W, channels, 3]
        return jnp.stack([pt0, pt1, dx], axis=-1)


class DenseFusion(nn.Module):
    """Color + per-axis geometry fusion with global pooled feature
    (TRPES.py:54-94). In: color_emb [B,N,64], geom_emb [B,N,C,3].
    Out: [B, N, 1792]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, geom_emb, color_emb):
        dense = lambda f: nn.Dense(f, dtype=self.dtype)
        c1 = nn.relu(dense(64)(color_emb))
        gx = nn.relu(dense(64)(geom_emb[..., 0]))
        gy = nn.relu(dense(64)(geom_emb[..., 1]))
        gz = nn.relu(dense(64)(geom_emb[..., 2]))
        feat1 = jnp.concatenate([c1, gx, gy, gz], -1)          # 256

        c2 = nn.relu(dense(128)(c1))
        gx2 = nn.relu(dense(128)(gx))
        gy2 = nn.relu(dense(128)(gy))
        gz2 = nn.relu(dense(128)(gz))
        feat2 = jnp.concatenate([c2, gx2, gy2, gz2], -1)       # 512

        x = nn.relu(dense(1024)(feat2))
        pooled = jnp.mean(x, axis=1, keepdims=True)            # AvgPool1d
        pooled = jnp.broadcast_to(pooled, x.shape)
        return jnp.concatenate([feat1, feat2, pooled], -1)     # 1792


class PosePredHead(nn.Module):
    """Per-point quaternion/translation/confidence with per-object output
    channels + one-hot class select (TRPES.py:154-203); optional
    transformer stage (TRPES.py:97-151). `use_equalized` swaps the dense
    stack for equalized-LR layers (equalized.py:45-100 — the reference
    vendors them behind a commented import, TRPES.py:16-17)."""

    num_obj: int
    use_transformer: bool = False
    use_equalized: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, apx, obj, train: bool = False):
        b, n, _ = apx.shape
        if self.use_equalized:
            from pose_estimation_tpu.models.equalized import EqualizedDense
            dense = lambda f: EqualizedDense(f, dtype=self.dtype)
        else:
            dense = lambda f: nn.Dense(f, dtype=self.dtype)

        def branch(out_dim, nhead):
            x = dense(640)(apx)
            if self.use_transformer:
                x = TransformerEncoderBlock(640, nhead,
                                            dtype=self.dtype)(x, train)
            x = dense(256)(x)
            if not self.use_transformer:
                x = dense(128)(x)
            x = dense(self.num_obj * out_dim)(x)
            x = x.reshape(b, n, self.num_obj, out_dim)
            onehot = jax.nn.one_hot(obj, self.num_obj, dtype=x.dtype)
            return jnp.einsum("bnod,bo->bnd", x, onehot)

        rx = branch(4, 8)
        tx = branch(3, 4)
        cx = jax.nn.sigmoid(branch(1, 2))
        return rx, tx, cx


class TRPESNet(nn.Module):
    """Full transparent pipeline model. Inputs mirror the reference
    (TRPES.py:238): img [B,H,W,3], intrinsic [B,4] (fx,fy,cx,cy), xmap/ymap
    [B,H,W] crop pixel-coordinate maps, d_scale [B], obj [B].

    Returns (quat [B,N,4], trans [B,N,3], conf [B,N,1], normal map,
    depth map, mask map)."""

    num_points: int = 500
    num_obj: int = 5
    use_transformer: bool = False
    use_equalized: bool = False
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, intrinsic, xmap, ymap, d_scale, obj,
                 train: bool = False):
        b, h, w, _ = img.shape
        color, normal_f, depth_f = UNet(self.norm, self.dtype)(img, train)
        feat0 = jnp.concatenate([normal_f, depth_f], -1)       # 128

        n32 = nn.Conv(32, (1, 1), dtype=self.dtype)(normal_f)
        d32 = nn.relu(nn.Conv(32, (1, 1), dtype=self.dtype)(depth_f))
        feat1 = jnp.concatenate([n32, d32, feat0], -1)         # 192

        pred_normal = nn.Conv(3, (1, 1), dtype=jnp.float32)(
            n32.astype(jnp.float32))
        pred_depth = nn.relu(nn.Conv(1, (1, 1), dtype=jnp.float32)(
            d32.astype(jnp.float32)))
        pred_mask = jax.nn.sigmoid(nn.Conv(1, (1, 1), dtype=jnp.float32)(
            feat1.astype(jnp.float32)))

        geom = GeometryNet(64, self.dtype)(feat1, intrinsic, xmap, ymap,
                                           d_scale)

        # choose: one random permutation shared across batch
        # (TRPES.py:261-262); deterministic stride in eval.
        if self.has_rng("choose"):
            perm = jax.random.permutation(self.make_rng("choose"), h * w)
            choose = perm[: self.num_points]
        else:
            stride = max((h * w) // self.num_points, 1)
            choose = jnp.arange(self.num_points) * stride % (h * w)
        choose = jnp.broadcast_to(choose[None], (b, self.num_points))

        color_emb = jnp.take_along_axis(
            color.reshape(b, h * w, -1), choose[..., None], 1)
        geom_emb = jnp.take_along_axis(
            geom.reshape(b, h * w, geom.shape[-2], 3),
            choose[..., None, None], 1)

        apx = DenseFusion(self.dtype)(geom_emb, color_emb)
        rx, tx, cx = PosePredHead(self.num_obj, self.use_transformer,
                                  self.use_equalized,
                                  self.dtype)(apx, obj, train)
        return rx, tx, cx, pred_normal, pred_depth, pred_mask
