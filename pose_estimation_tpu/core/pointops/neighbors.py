"""Point-cloud neighborhood ops (XLA path).

Replaces the reference's brute-force torch ops (lib/network/point/gcn3d.py:
15-57: get_neighbor_index / get_nearest_index / indexing_neighbor) and the
pykeops runtime-compiled CUDA KNN (train.py:123-127, lib/network/loss.py:34).

Everything here is batched, static-shape, and jit/vmap/grad-safe. The
pairwise-distance Gram matmul is the hot op and is dispatched to the MXU by
XLA; for point counts where the N^2 matrix doesn't fit comfortably in VMEM a
tiled Pallas kernel (pose_estimation_tpu.ops.pallas_pointops) computes the
same results without materializing N^2 in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pose_estimation_tpu.core.precision import einsum as _einsum


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances [..., n, m] between [..., n, d], [..., m, d].

    Same expansion as the reference (gcn3d.py:21-23): |a|^2 + |b|^2 - 2 a.b.
    Uses HIGHEST matmul precision — argmin ordering is sensitive to the
    default bf16 matmul lowering.
    """
    inner = _einsum("...nd,...md->...nm", a, b)
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    return a2[..., :, None] + b2[..., None, :] - 2.0 * inner


def _smallest_k_indices(d: jax.Array, kk: int) -> jax.Array:
    """Indices of the kk smallest entries along the last axis. On TPU this
    uses lax.approx_min_k — the hardware-binned top-k (measured several ms
    faster than lax.top_k's full sort at [B,1024,1024]); recall@1 is exact
    and the GCN only needs near neighbors, not the exact k-th. CPU keeps
    the exact path (tests compare against brute force)."""
    if jax.default_backend() == "tpu" and d.shape[-1] >= 128:
        _, idx = jax.lax.approx_min_k(d, kk)
        return idx
    _, idx = jax.lax.top_k(-d, kk)
    return idx


def knn_indices(vertices: jax.Array, k: int, exclude_self: bool = True) -> jax.Array:
    """K nearest neighbors of each point within the same cloud.

    vertices: [..., n, 3] -> indices [..., n, k].
    Parity: gcn3d.get_neighbor_index (topk(k+1) then drop column 0 == self).
    """
    d = pairwise_sqdist(vertices, vertices)
    kk = k + 1 if exclude_self else k
    idx = _smallest_k_indices(d, kk)
    return idx[..., 1:] if exclude_self else idx


def knn_indices_cross(queries: jax.Array, keys: jax.Array, k: int,
                      exclude_self: bool = False) -> jax.Array:
    """K nearest `keys` for each query point.

    queries [..., m, 3], keys [..., n, 3] -> [..., m, k]. With
    exclude_self=True (queries are a subset of keys) the zero-distance
    self-match is dropped — letting pool layers subsample BEFORE the
    neighbor search instead of after (identical output at 1/pooling_rate
    of the distance-matrix and top-k cost).
    """
    d = pairwise_sqdist(queries, keys)
    kk = k + 1 if exclude_self else k
    idx = _smallest_k_indices(d, kk)
    return idx[..., 1:] if exclude_self else idx


def nearest_index(target: jax.Array, source: jax.Array) -> jax.Array:
    """Index into `source` of the nearest source point for each target point.

    target: [..., n1, 3], source: [..., n2, 3] -> [..., n1] int32.
    Parity: gcn3d.get_nearest_index (returns [..., n1, 1]; we drop the 1).
    """
    d = pairwise_sqdist(target, source)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def min_dists(target: jax.Array, source: jax.Array,
              eps: float = 1e-8) -> jax.Array:
    """Distance from each target point to its nearest source point [..., n1].

    The core of ADD-S (lib/utils/metric.py:27-31) and the symmetric-object
    closest-point loss (lib/network/loss.py:34-36) — here fused so the N^2
    matrix never leaves registers/VMEM under XLA fusion.

    The sqrt is clamped at eps^2 INSIDE (core/mathsafe.py rationale):
    pairwise_sqdist's dot-product form cancels to exactly 0 (or slightly
    negative) for coincident points, and sqrt'(0) = inf. When this feeds a
    chamfer term computed for every sample but `where`-selected only for
    symmetric ones, the unselected branch's 0 cotangent x inf = NaN poisons
    the WHOLE batch gradient — the transparent pipeline's r2/r3 plateau
    (every step skipped_nonfinite) was exactly this. eps=1e-8 m is far
    below any ADD resolution; values are unchanged beyond 1e-8.
    """
    d = pairwise_sqdist(target, source)
    return jnp.sqrt(jnp.maximum(jnp.min(d, axis=-1), eps * eps))


def gather_neighbors(features: jax.Array, index: jax.Array) -> jax.Array:
    """Gather per-point neighbor features.

    features: [..., n, c], index: [..., m, k] -> [..., m, k, c].
    Parity: gcn3d.indexing_neighbor.
    """
    return jnp.take_along_axis(
        features[..., None, :], index[..., None], axis=-3
    )


# Above this row count the one-hot matmul's flops overtake the
# random-access gather penalty (same threshold as ops.pallas_gcn).
_ONEHOT_GATHER_MAX_N = 2048


def gather_rows(features: jax.Array, index: jax.Array) -> jax.Array:
    """Gather rows of a per-batch feature table: [B, n, c], [B, m] ->
    [B, m, c].

    On TPU the gather is cast as `onehot(index) @ features` — a
    streaming MXU matmul instead of random HBM access (~7x off peak
    bandwidth); exact row selection, bit-identical values. Elsewhere a
    plain take_along_axis.
    """
    n = features.shape[-2]
    if jax.default_backend() == "tpu" and n <= _ONEHOT_GATHER_MAX_N:
        iota = jnp.arange(n)
        dtype = (features.dtype if features.dtype == jnp.bfloat16
                 else jnp.float32)
        onehot = (index[..., :, None] == iota).astype(dtype)
        return jnp.einsum("...mn,...nc->...mc", onehot,
                          features.astype(dtype)).astype(features.dtype)
    return jnp.take_along_axis(features, index[..., None], axis=-2)


def gather_neighbors_max(features: jax.Array,
                         index: jax.Array) -> jax.Array:
    """max_k features[index[..., m, k]]: the Pool_layer neighbor
    max-pool ([..., n, c], [..., m, k] -> [..., m, c]) without ever
    materializing the [..., m, k, c] gathered block — each neighbor
    slot is one one-hot MXU matmul on TPU (see gather_rows)."""
    n = features.shape[-2]
    k = index.shape[-1]
    if jax.default_backend() == "tpu" and n <= _ONEHOT_GATHER_MAX_N:
        acc = None
        for kk in range(k):
            g = gather_rows(features, index[..., kk])
            acc = g if acc is None else jnp.maximum(acc, g)
        return acc
    return jnp.max(gather_neighbors(features, index), axis=-2)


def neighbor_directions(vertices: jax.Array, index: jax.Array,
                        eps: float = 1e-6) -> jax.Array:
    """Unit direction vectors from each point to its k neighbors.

    [..., n, 3], [..., n, k] -> [..., n, k, 3].
    Parity: gcn3d.get_neighbor_direction_norm (F.normalize semantics:
    zero vectors stay zero). Grad-safe at coincident points (duplicate
    cloud points from 'wrap'-padded choose): the norm is computed from a
    clamped squared distance so d/||d||'s gradient stays bounded instead
    of exploding as 1/||d|| -> inf (observed NaN'ing training).
    """
    neigh = gather_neighbors(vertices, index)
    d = neigh - vertices[..., :, None, :]
    sq = jnp.sum(d * d, axis=-1, keepdims=True)
    degenerate = sq < eps * eps
    # where-trick: both branches NaN-free in value AND gradient
    safe_n = jnp.sqrt(jnp.where(degenerate, 1.0, sq))
    return jnp.where(degenerate, 0.0, d / safe_n)


def farthest_point_sampling(points: jax.Array, num_samples: int,
                            start_index: int = 0) -> jax.Array:
    """Deterministic FPS: indices [..., num_samples] of a maximally-spread
    subset. Replaces the mesh FPS samplers (tools/script/sample_model.py:33-88,
    version/transparent/lib/utils.py:158-201) as an on-device op.
    """
    def single(pts):
        n = pts.shape[0]
        d2 = jnp.full((n,), jnp.inf, pts.dtype)

        def body(carry, _):
            d2, last = carry
            dist = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            d2 = jnp.minimum(d2, dist)
            nxt = jnp.argmax(d2).astype(jnp.int32)
            return (d2, nxt), last

        (_, _), idx = jax.lax.scan(
            body, (d2, jnp.int32(start_index)), None, length=num_samples)
        return idx

    batch_dims = points.ndim - 2
    fn = single
    for _ in range(batch_dims):
        fn = jax.vmap(fn)
    return fn(points)


def random_subsample_pool(key: jax.Array, vertices: jax.Array,
                          features: jax.Array, pool_num: int,
                          neighbor_num: int = 4):
    """3D-GCN Pool_layer: neighbor max-pool then random subsample.

    vertices [..., n, d_v], features [..., n, c] -> ([..., pool_num, d_v],
    [..., pool_num, c]). Parity: gcn3d.Pool_layer (gcn3d.py:218-242) — the
    reference uses one torch.randperm shared across the batch; we mirror that
    (a single permutation per call) so behavior matches and shapes stay static.
    Note the reference computes the KNN on vertices[..., :3] only.
    """
    n = vertices.shape[-2]
    idx = knn_indices(vertices[..., :3], neighbor_num, exclude_self=True)
    pooled = jnp.max(gather_neighbors(features, idx), axis=-2)
    sample = jax.random.permutation(key, n)[:pool_num]
    return (jnp.take(vertices, sample, axis=-2),
            jnp.take(pooled, sample, axis=-2))
