"""PSPNet-generation transparent pose network (first gen).

Rebuild of version/transparent/lib/networks/{backbone,resnet,network}.py:
dilated ResNet18 feature extractor (stride 8), PSP pyramid pooling to
1024ch, three PSPUpsample decoder branches (color 32ch log-softmax,
normal 3ch, depth 1ch) sharing a fused 192-ch feature map, a 2-channel
sigmoid mask head (network.py:303-327), GeoNet per-channel backprojection
(network.py:127-153), DenseFusion PointFeatNet 256+512+2048=2816
(network.py:156-198) and the PosePredNet heads (network.py:201-292).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pose_estimation_tpu.models.layers import ConvNorm, Norm, resize_bilinear
from pose_estimation_tpu.models.transparent import TransformerEncoderBlock


class ResNetBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.relu(Norm(self.norm, dtype=self.dtype)(y, train))
        y = nn.Conv(self.features, (3, 3),
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=self.dtype)(y)
        y = Norm(self.norm, dtype=self.dtype)(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = ConvNorm(self.features, 1, self.stride, False,
                                self.norm, self.dtype)(x, train)
        return nn.relu(y + residual)


class ResNet18Stride8(nn.Module):
    """ResNet18 feature extractor, output stride 8 (layers 3/4 dilated) —
    the lib/networks/resnet.py:90-161 extractor."""

    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNorm(64, 7, 2, True, self.norm, self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for f, s, d in ((64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)):
            x = ResNetBlock(f, s, d, self.norm, self.dtype)(x, train)
            x = ResNetBlock(f, 1, d, self.norm, self.dtype)(x, train)
        return x  # [B, H/8, W/8, 512]


class PSPModule(nn.Module):
    """Pyramid pooling (backbone.py:17-35)."""

    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        priors = []
        for size in self.sizes:
            # adaptive average pool to (size, size)
            ph, pw = h // size, w // size
            pooled = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            pooled = nn.Conv(c, (1, 1), use_bias=False,
                             dtype=self.dtype)(pooled)
            priors.append(resize_bilinear(pooled, h, w))
        priors.append(x)
        cat = jnp.concatenate(priors, -1)
        return nn.relu(nn.Conv(self.out_features, (1, 1),
                               dtype=self.dtype)(cat))


class PSPUpsample(nn.Module):
    """x2 bilinear + conv + PReLU (backbone.py:51-61)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = resize_bilinear(x, x.shape[1] * 2, x.shape[2] * 2)
        x = nn.Conv(self.features, (3, 3), dtype=self.dtype)(x)
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, alpha * x)


class PSPDecoder(nn.Module):
    """Three upsample branches -> (color logits 32, normal 3, depth 1,
    fused 192-ch feature) (network.py:32-124)."""

    norm: str = "gn"
    dropout: float = 0.15
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, train: bool = False):
        drop = lambda x: nn.Dropout(self.dropout,
                                    deterministic=not train)(x)

        def branch(x):
            x = PSPUpsample(256, self.dtype)(x)
            x = drop(x)
            x = PSPUpsample(64, self.dtype)(x)
            x = drop(x)
            return PSPUpsample(64, self.dtype)(x)

        c = branch(nn.Dropout(0.3, deterministic=not train)(p))
        color = nn.log_softmax(nn.Conv(32, (1, 1), dtype=jnp.float32)(
            c.astype(jnp.float32)), axis=-1)

        n1 = branch(p)
        d1 = branch(p)
        f1 = jnp.concatenate([n1, d1], -1)                      # 128
        n2 = nn.Conv(32, (1, 1), dtype=self.dtype)(f1)
        d2 = nn.relu(nn.Conv(32, (1, 1), dtype=self.dtype)(f1))
        f2 = jnp.concatenate([n2, d2], -1)                      # 64
        n3 = nn.Conv(3, (1, 1), dtype=jnp.float32)(f2.astype(jnp.float32))
        # grad-safe at exactly-zero vectors (core/mathsafe.py)
        from pose_estimation_tpu.core.mathsafe import safe_normalize
        n3 = safe_normalize(n3)
        d3 = nn.relu(nn.Conv(1, (1, 1), dtype=jnp.float32)(
            f2.astype(jnp.float32)))
        f3 = jnp.concatenate([f1, f2], -1)                      # 192
        return color, n3, d3, f3


class GeoNet(nn.Module):
    """192-ch fused feature -> 32-channel pseudo point cloud
    (network.py:127-153)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, intrinsic, xmap, ymap, d_scale):
        dx = nn.relu(nn.Conv(64, (1, 1), dtype=self.dtype)(feat))
        dx = nn.relu(nn.Conv(32, (1, 1), dtype=self.dtype)(dx))
        dx = dx * d_scale[:, None, None, None]
        fx = intrinsic[:, 0][:, None, None, None]
        fy = intrinsic[:, 1][:, None, None, None]
        cx = intrinsic[:, 2][:, None, None, None]
        cy = intrinsic[:, 3][:, None, None, None]
        pt0 = (xmap[..., None] - cx) * dx / fx
        pt1 = (ymap[..., None] - cy) * dx / fy
        return jnp.stack([pt0, pt1, dx], axis=-1)  # [B,H,W,32,3]


class PointFeatNet(nn.Module):
    """DenseFusion concat 256+512+2048 = 2816 (network.py:156-198)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, geom_emb, color_emb):
        dense = lambda f: nn.Dense(f, dtype=self.dtype)
        c1 = nn.relu(dense(64)(color_emb))
        g1 = [nn.relu(dense(64)(geom_emb[..., i])) for i in range(3)]
        feat1 = jnp.concatenate([c1] + g1, -1)                  # 256
        c2 = nn.relu(dense(128)(c1))
        g2 = [nn.relu(dense(128)(g)) for g in g1]
        feat2 = jnp.concatenate([c2] + g2, -1)                  # 512
        x = nn.relu(dense(1024)(feat2))
        x = nn.relu(dense(2048)(x))
        pooled = jnp.broadcast_to(jnp.mean(x, 1, keepdims=True), x.shape)
        return jnp.concatenate([feat1, feat2, pooled], -1)      # 2816


class PosePredNet(nn.Module):
    """Per-point quat/trans/conf heads over 2816-d features with per-object
    channels (network.py:201-249); transformer variant (:252-292)."""

    num_obj: int
    use_transformer: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, apx, obj, train: bool = False):
        b, n, _ = apx.shape

        def branch(out_dim, nhead):
            x = nn.relu(nn.Dense(640, dtype=self.dtype)(apx))
            if self.use_transformer:
                x = TransformerEncoderBlock(640, nhead,
                                            dtype=self.dtype)(x, train)
            x = nn.relu(nn.Dense(256, dtype=self.dtype)(x))
            x = nn.relu(nn.Dense(128, dtype=self.dtype)(x))
            x = nn.Dense(self.num_obj * out_dim, dtype=self.dtype)(x)
            x = x.reshape(b, n, self.num_obj, out_dim)
            onehot = jax.nn.one_hot(obj, self.num_obj, dtype=x.dtype)
            return jnp.einsum("bnod,bo->bnd", x, onehot)

        rx = branch(4, 8)
        tx = branch(3, 4)
        cx = jax.nn.sigmoid(branch(1, 2))
        return rx, tx, cx


class TransparentPoseNet(nn.Module):
    """First-gen full model, 'PoseNet' in network.py:296-367: PSPNet
    backbone + decoder + mask head + GeoNet + PointFeatNet + PosePredNet.

    Inputs: img [B,H,W,3], intrinsic [B,4], xmap/ymap [B,H,W], d_scale [B],
    obj [B], choose [B,N] flat pixel indices (explicit — the reference draws
    random pixels inside forward, network.py:339-342).
    """

    num_obj: int = 5
    num_points: int = 256  # points sampled per frame (network.py num_points)
    use_transformer: bool = False
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, intrinsic, xmap, ymap, d_scale, obj, choose,
                 train: bool = False):
        b, h, w, _ = img.shape
        f = ResNet18Stride8(self.norm, self.dtype)(img, train)
        p = PSPModule(1024, dtype=self.dtype)(f)
        color, normal, depth, f3 = PSPDecoder(
            self.norm, dtype=self.dtype)(p, train)

        mask = jax.nn.sigmoid(nn.Conv(2, (1, 1), dtype=jnp.float32)(
            f3.astype(jnp.float32)))  # mask + boundary (network.py:303-327)

        geom = GeoNet(self.dtype)(f3, intrinsic, xmap, ymap, d_scale)

        color_emb = jnp.take_along_axis(
            color.reshape(b, h * w, -1), choose[..., None], 1)
        geom_emb = jnp.take_along_axis(
            geom.reshape(b, h * w, geom.shape[-2], 3),
            choose[..., None, None], 1)
        apx = PointFeatNet(self.dtype)(geom_emb, color_emb)
        rx, tx, cx = PosePredNet(self.num_obj, self.use_transformer,
                                 self.dtype)(apx, obj, train)
        return {
            "quat": rx, "trans": tx, "conf": cx,
            "color": color, "normal": normal, "depth": depth,
            "mask": mask[..., 0:1], "boundary": mask[..., 1:2],
        }
