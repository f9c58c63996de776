"""Pallas TPU kernels for O(N^2) point-cloud ops.

The reference's point ops materialize full N^2 distance matrices in GPU
memory (gcn3d.py:15-26 brute-force KNN; lib/utils/metric.py:27-31 N x N
ADD-S; pykeops CUDA-codegen KNN in the losses). These kernels tile the
computation through VMEM so the N^2 matrix never exists in HBM:

- `min_dists`: per-target nearest-source distance (ADD-S / chamfer core)
- `knn`: k-nearest-neighbor indices within a cloud

Layout notes (see /opt/skills/guides/pallas_guide.md):
- points are processed in (TILE_T, chunk) distance blocks; the Gram inner
  product is a (TILE_T, 3) x (3, chunk) matmul on the MXU;
- running min / running top-k live in VMEM scratch across source chunks;
- argmin/top-k maintenance is k iterative masked min-reductions (no
  lax.top_k inside the kernel).

On CPU (tests) the kernels run with interpret=True; the public wrappers
dispatch to the plain-XLA implementations for small N where a single fused
XLA program is already optimal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pose_estimation_tpu.core.pointops import neighbors as _xla

_INF = 1e30  # python float: jnp scalars would be captured consts in kernels


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# min_dists: for each target point, distance to nearest source point
# ---------------------------------------------------------------------------

def _min_dists_kernel(t_ref, s_ref, o_ref, *, chunk: int, m_valid: int):
    """One target tile (TILE_T, 3) vs all source chunks (chunk, 3)."""
    t = t_ref[0]  # (TILE_T, 3)
    t2 = jnp.sum(t * t, axis=-1, keepdims=True)  # (TILE_T, 1)
    m_pad = s_ref.shape[1]
    num_chunks = m_pad // chunk

    def body(ci, best):
        s = s_ref[0, pl.ds(ci * chunk, chunk), :]  # (chunk, 3)
        s2 = jnp.sum(s * s, axis=-1)[None, :]  # (1, chunk)
        inner = jax.lax.dot_general(
            t, s, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (TILE_T, chunk)
        d = t2 + s2 - 2.0 * inner
        # mask padded source rows
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + ci * chunk
        d = jnp.where(col < m_valid, d, _INF)
        return jnp.minimum(best, jnp.min(d, axis=-1, keepdims=True))

    best = jax.lax.fori_loop(
        0, num_chunks, body,
        jnp.full((t.shape[0], 1), _INF, jnp.float32))
    o_ref[0, :] = jnp.sqrt(jnp.maximum(best[:, 0], 1e-16))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _min_dists_pallas(target: jax.Array, source: jax.Array,
                      interpret: bool = False) -> jax.Array:
    b, n, _ = target.shape
    m = source.shape[1]
    tile_t = 256
    chunk = 512
    n_pad = _round_up(n, tile_t)
    m_pad = _round_up(m, chunk)
    tgt = jnp.pad(target.astype(jnp.float32),
                  ((0, 0), (0, n_pad - n), (0, 0)))
    src = jnp.pad(source.astype(jnp.float32),
                  ((0, 0), (0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_min_dists_kernel, chunk=chunk, m_valid=m),
        grid=(b, n_pad // tile_t),
        in_specs=[
            pl.BlockSpec((1, tile_t, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, m_pad, 3), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_t), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
        interpret=interpret,
    )(tgt, src)
    return out[:, :n]


def min_dists(target: jax.Array, source: jax.Array,
              force_pallas: bool = False) -> jax.Array:
    """Nearest-source distance per target point: [B, N, 3], [B, M, 3] -> [B, N].

    Dispatch: plain XLA for small problems (single fused program is optimal),
    Pallas tiling once the distance matrix stops fitting on-chip.
    """
    b, n, _ = target.shape
    m = source.shape[1]
    if not force_pallas and (n * m <= 4096 * 4096 or _is_cpu()):
        return _xla.min_dists(target, source)
    return _min_dists_pallas(target, source, interpret=_is_cpu())


# ---------------------------------------------------------------------------
# knn: indices of k nearest neighbors within one cloud
# ---------------------------------------------------------------------------

def _knn_kernel(t_ref, s_ref, oi_ref, *, chunk: int, k: int, n_valid: int,
                tile_t: int, exclude_self: bool):
    t = t_ref[0]  # (TILE_T, 3)
    t2 = jnp.sum(t * t, axis=-1, keepdims=True)
    n_pad = s_ref.shape[1]
    num_chunks = n_pad // chunk
    row_global = (jax.lax.broadcasted_iota(jnp.int32, (tile_t, 1), 0)
                  + pl.program_id(1) * tile_t)

    def body(ci, carry):
        best_d, best_i = carry  # (TILE_T, k) each
        s = s_ref[0, pl.ds(ci * chunk, chunk), :]
        s2 = jnp.sum(s * s, axis=-1)[None, :]
        inner = jax.lax.dot_general(
            t, s, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        d = t2 + s2 - 2.0 * inner  # (TILE_T, chunk)
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + ci * chunk
        invalid = col >= n_valid
        if exclude_self:
            invalid = invalid | (col == row_global)
        d = jnp.where(invalid, _INF, d)

        md = jnp.concatenate([best_d, d], axis=1)          # (TILE_T, k+chunk)
        mi = jnp.concatenate([best_i, col], axis=1)

        new_d = []
        new_i = []
        for _ in range(k):
            sel = jnp.min(md, axis=1, keepdims=True)       # (TILE_T, 1)
            am = jnp.argmin(md, axis=1)                    # (TILE_T,)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, md.shape, 1)
                      == am[:, None])
            sel_i = jnp.sum(jnp.where(onehot, mi, 0), axis=1, keepdims=True)
            new_d.append(sel)
            new_i.append(sel_i)
            md = jnp.where(onehot, _INF, md)
        return (jnp.concatenate(new_d, axis=1),
                jnp.concatenate(new_i, axis=1).astype(jnp.int32))

    init = (jnp.full((tile_t, k), _INF, jnp.float32),
            jnp.zeros((tile_t, k), jnp.int32))
    _, best_i = jax.lax.fori_loop(0, num_chunks, body, init)
    oi_ref[0] = best_i


@functools.partial(jax.jit, static_argnames=("k", "exclude_self", "interpret"))
def _knn_pallas(points: jax.Array, k: int, exclude_self: bool = True,
                interpret: bool = False) -> jax.Array:
    b, n, _ = points.shape
    tile_t = 128
    chunk = 512
    n_pad = _round_up(n, max(tile_t, chunk))
    pts = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 0)))

    idx = pl.pallas_call(
        functools.partial(_knn_kernel, chunk=chunk, k=k, n_valid=n,
                          tile_t=tile_t, exclude_self=exclude_self),
        grid=(b, n_pad // tile_t),
        in_specs=[
            pl.BlockSpec((1, tile_t, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_pad, 3), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_t, k), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, k), jnp.int32),
        interpret=interpret,
    )(pts, pts)
    return idx[:, :n]


def knn_indices(points: jax.Array, k: int, exclude_self: bool = True,
                force_pallas: bool = False) -> jax.Array:
    """KNN indices [B, N, k] within each cloud [B, N, 3]."""
    n = points.shape[1]
    if not force_pallas and (n <= 4096 or _is_cpu()):
        return _xla.knn_indices(points, k, exclude_self)
    return _knn_pallas(points, k, exclude_self, interpret=_is_cpu())
