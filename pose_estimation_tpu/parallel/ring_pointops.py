"""Ring-sharded point-cloud ops over the device mesh ("SP" for point sets).

The reference's analog of context scaling is point-count scaling: all its
point ops are brute-force O(N^2) on one GPU (SURVEY.md section 5.7). Here
the source point set shards across the 'data' mesh axis and rotates around
the ring with jax.lax.ppermute while each device keeps a running
min/top-k against its resident target shard — the direct analog of ring
attention, letting chamfer/KNN/ADD-S scale past single-chip memory with
compute-communication overlap handled by XLA.

Works on any mesh axis; tested on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pose_estimation_tpu.core.pointops.neighbors import pairwise_sqdist


def _pvary(x, axis):
    """pcast-to-varying (jax.lax.pvary deprecated; jax >= 0.7 spelling)."""
    return jax.lax.pcast(x, axis, to="varying")


def ring_min_dists(mesh: Mesh, axis: str = "data"):
    """Returns fn(target [N,3], source [M,3]) -> [N] nearest-source
    distances, with BOTH point sets sharded over `axis` (N and M are global
    sizes; each device holds N/d and M/d rows).

    Each of the d ring steps computes a (N/d, M/d) distance block and
    ppermutes the source shard to the next device: peak memory per device
    is (N*M)/d^2 instead of N*M.
    """
    d = mesh.shape[axis]

    def local(tgt, src):
        def body(i, carry):
            best, src_blk = carry
            dist = pairwise_sqdist(tgt, src_blk)
            best = jnp.minimum(best, jnp.min(dist, axis=-1))
            src_blk = jax.lax.ppermute(
                src_blk, axis,
                [(j, (j + 1) % d) for j in range(d)])
            return best, src_blk

        init = _pvary(
            jnp.full((tgt.shape[0],), jnp.inf, tgt.dtype), axis)
        best, _ = jax.lax.fori_loop(0, d, body, (init, src))
        # eps^2 clamp inside the sqrt: grad-safe at coincident points
        # (parity with core.pointops.min_dists; core/mathsafe.py)
        return jnp.sqrt(jnp.maximum(best, jnp.asarray(1e-16, best.dtype)))

    return shard_map(local, mesh=mesh,
                     in_specs=(P(axis), P(axis)),
                     out_specs=P(axis))


def ring_knn(mesh: Mesh, k: int, axis: str = "data"):
    """Returns fn(points [N,3]) -> (dists [N,k], idx [N,k]) global KNN over
    a sharded cloud: query shard stays resident; the full cloud rotates
    around the ring; running top-k maintained by merge+lax.top_k per step.
    """
    d = mesh.shape[axis]

    def local(pts):
        n_local = pts.shape[0]
        my = jax.lax.axis_index(axis)

        def body(i, carry):
            best_d, best_i, blk, blk_owner = carry
            dist = pairwise_sqdist(pts, blk)  # [n_local, m_local]
            m_local = blk.shape[1] if blk.ndim > 1 else blk.shape[0]
            col = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
                   + blk_owner * blk.shape[0])
            # self-exclusion: global row id == global col id
            row = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 0)
                   + my * n_local)
            dist = jnp.where(col == row, jnp.inf, dist)

            merged_d = jnp.concatenate([best_d, dist], axis=1)
            merged_i = jnp.concatenate([best_i, col], axis=1)
            neg_d, arg = jax.lax.top_k(-merged_d, k)
            best_i = jnp.take_along_axis(merged_i, arg, axis=1)
            best_d = -neg_d
            blk = jax.lax.ppermute(
                blk, axis, [(j, (j + 1) % d) for j in range(d)])
            blk_owner = jax.lax.ppermute(
                blk_owner, axis, [(j, (j + 1) % d) for j in range(d)])
            return best_d, best_i, blk, blk_owner

        init = (_pvary(jnp.full((n_local, k), jnp.inf, pts.dtype),
                              axis),
                _pvary(jnp.zeros((n_local, k), jnp.int32), axis),
                pts, my)
        best_d, best_i, _, _ = jax.lax.fori_loop(0, d, body, init)
        return jnp.sqrt(jnp.maximum(
            best_d, jnp.asarray(1e-16, best_d.dtype))), best_i

    return shard_map(local, mesh=mesh,
                     in_specs=P(axis),
                     out_specs=(P(axis), P(axis)))
