"""Dense RGB <-> point-cloud fusion networks (3D-GCN three-stream).

Rebuild of lib/network/point/fusion.py: three parallel 3D-GCN streams over
(depth cloud `vertices`, predicted model coords `xyz`, predicted `normal`)
sharing the KNN graph of `vertices`; two pooling levels N -> N/4 -> N/16;
9-D Conv_fuse layers on the concatenated streams; nearest-neighbor upsample
back to N. FusionNetLite (fusion.py:137-240, the default — krrn.py:88)
outputs [B, N, 1280] = 3*128 + 3*128 + 512.

TPU notes: all three streams share neighbor indices, computed once; KNN
inputs mirror the reference's .detach() (fusion.py:205,223,231-232) with
stop_gradient; norm defaults to GroupNorm over the channel axis of the
[B, N, C] point features (reference: BatchNorm1d).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pose_estimation_tpu.core import pointops as po
from pose_estimation_tpu.models.gcn3d import (ConvLayer, ConvSurface, PoolLayer)
from pose_estimation_tpu.models.layers import Norm


def _sg(x):
    return jax.lax.stop_gradient(x)


class _Stream(nn.Module):
    """One per-modality stream: surface conv + 2 graph convs with norms."""

    ch0: int
    ch1: int
    ch2: int
    support_num: int
    norm: str = "gn"
    dtype: Any = jnp.float32

    def setup(self):
        self.conv0 = ConvSurface(self.ch0, self.support_num, dtype=self.dtype)
        self.conv1 = ConvLayer(self.ch1, self.support_num, dtype=self.dtype)
        self.conv2 = ConvLayer(self.ch2, self.support_num, dtype=self.dtype)
        self.norm1 = Norm(self.norm, dtype=self.dtype)
        self.norm2 = Norm(self.norm, dtype=self.dtype)

    def level0(self, idx, pts, train=False):
        f0 = nn.relu(self.conv0(idx, pts))
        f1 = nn.relu(self.norm1(self.conv1(idx, pts, f0), train))
        return f1

    def level1(self, idx, pts, feat, train=False):
        return nn.relu(self.norm2(self.conv2(idx, pts, feat), train))


def _fused_convs(convs, idx, pts_list, feat_list, support_num,
                 train=False):
    """Run N narrow ConvLayers sharing one KNN graph through the
    shared-gather fused aggregate (ops.pallas_gcn.
    gcn_aggregate_linear_multi). Identical math and identical param
    tree to calling each ConvLayer directly.

    Training steps prefer the XLA formulation: its fwd+bwd live in one
    XLA graph that shares intermediates, whereas the Pallas kernel's
    custom_vjp backward re-runs the XLA forward from scratch — kernel
    fwd is an eval-path win only."""
    from pose_estimation_tpu.ops.pallas_gcn import (
        gcn_aggregate_linear_multi)
    parts = [c(idx, p, f, parts=True)
             for c, p, f in zip(convs, pts_list, feat_list)]
    centers, dirs_l, nds, xs, ws, bs = map(list, zip(*parts))
    aggs = gcn_aggregate_linear_multi(nds, dirs_l, xs, ws, bs, idx,
                                      support_num, prefer_xla=train)
    return [c + a.astype(c.dtype) for c, a in zip(centers, aggs)]


def _fused_level0(streams, idx, pts_list, support_num, dtype, train):
    """The 3 streams' level-0 pass with BOTH hot aggregates fused:
    the ConvSurfaces run through the multi-stream theta kernel and the
    conv1s through the shared-gather kernel (the two hottest blocks of
    the forward). Identical math and identical param tree to calling
    `_Stream.level0` per stream."""
    from pose_estimation_tpu.ops.pallas_gcn import gcn_surface_multi
    surf = [st.conv0(idx, p, parts=True)
            for st, p in zip(streams, pts_list)]
    dirs0, nds0 = map(list, zip(*surf))
    f0s = [nn.relu(a.astype(dtype)) for a in
           gcn_surface_multi(nds0, dirs0, support_num, prefer_xla=train)]
    ys = _fused_convs([st.conv1 for st in streams], idx, pts_list, f0s,
                      support_num, train)
    return [nn.relu(st.norm1(y, train))
            for st, y in zip(streams, ys)]


def _fused_level1(streams, idx1, pts_list, feat_list, support_num, train):
    """Level-1: the 3 conv2 layers share idx1's gather the same way."""
    ys = _fused_convs([st.conv2 for st in streams], idx1, pts_list,
                      feat_list, support_num, train)
    return [nn.relu(st.norm2(y, train))
            for st, y in zip(streams, ys)]


class FusionNetLite(nn.Module):
    """Default fusion (fusion.py:137-240). Output [B, N, 1280]."""

    neighbor_num: int = 10
    support_num: int = 7
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vertices, xyz, normal, train: bool = False):
        k = self.neighbor_num
        n = vertices.shape[1]
        idx = po.knn_indices(_sg(vertices), k)

        # Level 0 runs through the fused shared-gather kernel (same math
        # and param tree as per-stream _Stream.level0). History: an r2
        # MultiConvLayer attempt concatenating the WIDE support tables
        # measured slower (317 vs 340 fps); the r5 fused path shares the
        # gather on the NARROW inputs inside a Pallas kernel instead.
        sv = _Stream(128, 128, 128, self.support_num, self.norm, self.dtype)
        sx = _Stream(128, 128, 128, self.support_num, self.norm, self.dtype)
        sn = _Stream(128, 128, 128, self.support_num, self.norm, self.dtype)

        fm_1_v, fm_1_x, fm_1_n = _fused_level0(
            [sv, sx, sn], idx, [vertices, xyz, normal],
            self.support_num, self.dtype, train)

        feat_1 = jnp.concatenate([fm_1_v, fm_1_x, fm_1_n], -1)  # [B,N,384]
        feat_9d = jnp.concatenate([vertices, xyz, normal], -1)  # [B,N,9]

        pool_v = PoolLayer(4, 4)
        pool_x = PoolLayer(4, 4)
        pool_n = PoolLayer(4, 4)
        pool_c1 = PoolLayer(4, 4)
        pool_c2 = PoolLayer(4, 4, return_sample=True)

        v_p1, f_p1_v = pool_v(vertices, fm_1_v)
        x_p1, f_p1_x = pool_x(xyz, fm_1_x)
        n_p1, f_p1_n = pool_n(normal, fm_1_n)
        pool_1, _ = pool_c1(feat_9d, feat_1)

        k1 = max(1, min(k, v_p1.shape[1] // 8))
        idx1 = po.knn_indices(_sg(v_p1), k1)

        fm_2_v, fm_2_x, fm_2_n = _fused_level1(
            [sv, sx, sn], idx1, [v_p1, x_p1, n_p1],
            [f_p1_v, f_p1_x, f_p1_n], self.support_num, train)

        feat_2 = jnp.concatenate([fm_2_v, fm_2_x, fm_2_n], -1)  # [B,N/4,384]
        pool_2, f_pool_2, s2 = pool_c2(pool_1, feat_2)

        k2 = max(1, min(k, pool_2.shape[1] // 8))
        idx2 = po.knn_indices(_sg(pool_2[..., :3]), k2)
        fm_4 = ConvLayer(512, self.support_num, point_dim=9,
                         dtype=self.dtype)(idx2, pool_2, f_pool_2)
        fm_5 = ConvLayer(512, self.support_num, point_dim=9,
                         dtype=self.dtype)(idx2, pool_2, fm_4)

        # pool_2 rows are a subsample of pool_1 rows (s2): one [N, N/4]
        # distance matrix serves both upsample index maps — near_2's
        # distances are just the s2 columns of near_1's.
        d1 = po.pairwise_sqdist(_sg(vertices), _sg(pool_1[..., :3]))
        near_1 = jnp.argmin(d1, axis=-1).astype(jnp.int32)
        if jax.default_backend() == "tpu":
            # batch-shared column subsample as one MXU matmul instead of
            # a random-access lane gather (same trick as po.gather_rows)
            sel = (s2[None, :] == jnp.arange(d1.shape[-1])[:, None]
                   ).astype(d1.dtype)
            d2 = d1 @ sel
        else:
            d2 = jnp.take(d1, s2, axis=-1)
        near_2 = jnp.argmin(d2, axis=-1).astype(jnp.int32)

        up = lambda f, ni: po.gather_rows(f, ni)  # onehot MXU on TPU
        # NOTE: the reference gathers full-res feat_1 with pool-level
        # nearest indices (fusion.py:234) — indices into the first N/4 rows
        # of an N-row tensor, i.e. features of unrelated points. feat_1 is
        # already at full resolution, so the clean semantics is to use it
        # directly; feat_2 (N/4) and fm_5 (N/16) are nearest-upsampled.
        feat_2_up = up(feat_2, near_1)
        fm_5_up = up(fm_5, near_2)
        return jnp.concatenate([fm_5_up, feat_1, feat_2_up], -1)


class FusionNet(nn.Module):
    """Full fusion (fusion.py:19-135). Output [B, N, 1664] = 512+384+768."""

    neighbor_num: int = 10
    support_num: int = 7
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vertices, xyz, normal, train: bool = False):
        k = self.neighbor_num
        idx = po.knn_indices(_sg(vertices), k)

        streams = [
            _Stream(128, 128, 256, self.support_num, self.norm, self.dtype)
            for _ in range(3)
        ]
        extra = [ConvLayer(256, self.support_num, dtype=self.dtype)
                 for _ in range(3)]

        inputs = [vertices, xyz, normal]
        fm1 = _fused_level0(streams, idx, inputs, self.support_num,
                            self.dtype, train)
        feat_1 = jnp.concatenate(fm1, -1)
        feat_9d = jnp.concatenate(inputs, -1)

        pools = [PoolLayer(4, 4) for _ in range(3)]
        pooled = [p(pt, f) for p, pt, f in zip(pools, inputs, fm1)]
        pool_1, _ = PoolLayer(4, 4)(feat_9d, feat_1)

        k1 = max(1, min(k, pooled[0][0].shape[1] // 8))
        idx1 = po.knn_indices(_sg(pooled[0][0]), k1)
        fm2 = _fused_level1(streams, idx1, [pt for pt, _ in pooled],
                            [f for _, f in pooled], self.support_num,
                            train)
        norm3 = [Norm(self.norm, dtype=self.dtype) for _ in range(3)]
        fm3_y = _fused_convs(extra, idx1, [pt for pt, _ in pooled], fm2,
                             self.support_num, train)
        fm3 = [nn.relu(nm(y, train)) for nm, y in zip(norm3, fm3_y)]
        feat_2 = jnp.concatenate(fm3, -1)  # [B, N/4, 768]

        pool_2, f_pool_2 = PoolLayer(4, 4)(pool_1, feat_2)
        k2 = max(1, min(k, pool_2.shape[1] // 8))
        idx2 = po.knn_indices(_sg(pool_2[..., :3]), k2)
        fm_4 = ConvLayer(256, self.support_num, point_dim=9,
                         dtype=self.dtype)(idx2, pool_2, f_pool_2)
        fm_5 = ConvLayer(512, self.support_num, point_dim=9,
                         dtype=self.dtype)(idx2, pool_2, fm_4)

        near_1 = po.nearest_index(_sg(vertices), _sg(pool_1[..., :3]))
        near_2 = po.nearest_index(_sg(vertices), _sg(pool_2[..., :3]))
        up = lambda f, ni: po.gather_rows(f, ni)  # onehot MXU on TPU
        # feat_1 used at full resolution directly (see FusionNetLite note).
        return jnp.concatenate(
            [up(fm_5, near_2), feat_1, up(feat_2, near_1)], -1)
