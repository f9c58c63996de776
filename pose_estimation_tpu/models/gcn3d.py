"""3D-GCN point-cloud convolution ops, flax.

Rebuild of the third-party 3D-GCN blocks the reference vendors
(lib/network/point/gcn3d.py:72-242: Conv_surface / Conv_layer /
Conv_fuse_layer / Pool_layer), re-expressed as batched einsum programs:

  theta[b,n,k,s,o] = relu(<unit dir to neighbor k, learned direction (s,o)>)
  out[b,n,o]       = sum_s max_k theta * (neighbor support feature)

The direction-kernel inner products and the feature projection are MXU
matmuls; neighbor gathers use core.pointops. The KNN index is computed by
the caller (shared across streams, as in fusion.py:175).

Note on the reference's randomness: Pool_layer subsamples with a single
torch.randperm shared across the batch (gcn3d.py:238-241); here the
permutation comes from a flax RNG stream ('pool'), or a deterministic
strided subsample when the stream is absent (eval).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pose_estimation_tpu.core import pointops as po


def _unit_directions(vertices, index):
    return po.neighbor_directions(vertices, index)


class ConvSurface(nn.Module):
    """Structure features from raw coordinates (gcn3d.py:72-112)."""

    kernel_num: int
    support_num: int
    point_dim: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, neighbor_index, vertices, parts=False):
        """With parts=True: declare the same params but return
        (dirs, nd) so a caller owning several streams on one KNN graph
        can run them through the fused multi-stream theta kernel
        (ops.pallas_gcn.gcn_surface_multi)."""
        s, o = self.support_num, self.kernel_num
        stdv = 1.0 / (s * o) ** 0.5
        directions = self.param(
            "directions",
            lambda k: jax.random.uniform(k, (self.point_dim, s * o),
                                         minval=-stdv, maxval=stdv))
        from pose_estimation_tpu.core.mathsafe import safe_normalize
        dirs = safe_normalize(directions, axis=0, eps=1e-12)
        nd = _unit_directions(vertices, neighbor_index)  # [b,n,k,d]
        if parts:
            return dirs, nd
        from pose_estimation_tpu.ops.pallas_gcn import gcn_aggregate
        return gcn_aggregate(nd, dirs, None, neighbor_index,
                             s).astype(self.dtype)


class ConvLayer(nn.Module):
    """Graph conv on features (gcn3d.py:115-164 / 167-216 for 9-D fuse)."""

    out_channel: int
    support_num: int
    point_dim: int = 3  # 9 for ConvFuse (direction space of the vertices)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, neighbor_index, vertices, feature_map, parts=False):
        """With parts=True (narrow inputs only): declare the same params
        but return (center, dirs, nd, x, w_support, b_support) WITHOUT
        running the aggregate, so a caller owning several streams on one
        KNN graph can run them through the shared-gather fused kernel
        (ops.pallas_gcn.gcn_aggregate_linear_multi)."""
        s, o = self.support_num, self.out_channel
        in_ch = feature_map.shape[-1]
        stdv = 1.0 / (o * (s + 1)) ** 0.5
        init = lambda k, shape: jax.random.uniform(
            k, shape, minval=-stdv, maxval=stdv)
        weights = self.param("weights", init, (in_ch, (s + 1) * o))
        bias = self.param("bias", init, ((s + 1) * o,))
        directions = self.param("directions", init, (self.point_dim, s * o))

        from pose_estimation_tpu.core.mathsafe import safe_normalize
        dirs = safe_normalize(directions, axis=0, eps=1e-12)
        nd = _unit_directions(vertices, neighbor_index)

        x = feature_map.astype(self.dtype)
        w = weights.astype(self.dtype)
        bb = bias.astype(self.dtype)
        if in_ch < s * o:
            # Narrow input: gather X then transform (identical math,
            # ~4x fewer flops at the level-0 shapes — see
            # ops.pallas_gcn.gcn_aggregate_linear).
            center = x @ w[:, :o] + bb[:o]
            if parts:
                return center, dirs, nd, x, w[:, o:], bb[o:]
            from pose_estimation_tpu.ops.pallas_gcn import (
                gcn_aggregate_linear)
            agg = gcn_aggregate_linear(nd, dirs, x, w[:, o:], bb[o:],
                                       neighbor_index, s).astype(self.dtype)
        else:
            if parts:
                raise ValueError("parts=True requires narrow input "
                                 f"(in_ch {in_ch} >= s*o {s * o})")
            feat = x @ w + bb
            center = feat[..., :o]
            support = feat[..., o:]                              # [b,n,s*o]
            from pose_estimation_tpu.ops.pallas_gcn import gcn_aggregate
            agg = gcn_aggregate(nd, dirs, support, neighbor_index,
                                s).astype(self.dtype)
        return center + agg


class PoolLayer(nn.Module):
    """Neighbor max-pool + subsample (gcn3d.py:218-242).

    Random permutation from the 'pool' RNG stream when present (training
    parity with torch.randperm); otherwise an evenly-strided subsample
    (deterministic eval — the reference randomizes at eval too, but a
    deterministic eval path is strictly better behaved).
    """

    pooling_rate: int = 4
    neighbor_num: int = 4
    return_sample: bool = False   # also return the subsample indices

    @nn.compact
    def __call__(self, vertices, feature_map):
        n = vertices.shape[-2]
        pool_num = n // self.pooling_rate
        # Subsample FIRST, then neighbor-max only at the sampled rows —
        # identical output to pool-then-subsample at 1/pooling_rate the
        # KNN + gather cost (the 5 pools were ~25% of FusionNetLite time).
        if self.has_rng("pool"):
            sample = jax.random.permutation(
                self.make_rng("pool"), n)[:pool_num]
        else:
            sample = jnp.arange(pool_num) * self.pooling_rate
        v_s = jnp.take(vertices, sample, axis=-2)
        idx = po.knn_indices_cross(v_s[..., :3], vertices[..., :3],
                                   self.neighbor_num, exclude_self=True)
        pooled = po.gather_neighbors_max(feature_map, idx)
        if self.return_sample:
            return v_s, pooled, sample
        return v_s, pooled
