"""TPU-optimized 3D-GCN neighbor aggregation.

The gcn3d convolutions (models/gcn3d.py, rebuilt from
lib/network/point/gcn3d.py:72-216) compute, per point n with k neighbors:

    out[n, o] = sum_s max_k relu(<dir_nk, D[:, s, o]>) * F[nbr(n, k), s, o]

Measured landscape on v5e (B=32, N=1024, K=10, S=7, O=128; device-loop
timing — host loops are unreliable through the axon relay, which dedupes
identical dispatches):

  naive XLA (materialize [B,N,K,S*O] theta + gathered F)   10.4 ms
  hand Pallas kernel, MXU dot / VPU FMA formulations       12.8 / 14.8 ms
  k-unrolled with per-k take_along_axis gathers            10.0 ms
  k-unrolled, ONE-HOT gather of the WIDE support table      5.7 ms
  one-hot gather of the NARROW input, transform after       4.1 ms  <-- used
  narrow take_along_axis (per-k / all-k)                    6.2 / 6.7 ms

Random-access gather is ~7x off peak HBM bandwidth on TPU; casting the
gather as `onehot(idx) @ X` streams on the MXU instead — FLOPs are
cheaper than random access. Because the support table is a LINEAR map
of the inputs, the gather can run on the narrow input (Cin=128) with
the (s+1)*O transform applied post-gather: identical math at 161 vs
600 GFLOP (gcn_aggregate_linear; ConvLayer picks it when Cin < S*O).
Peak intermediate is one [B,N,S*O] slab (59 MB), never [B,N,K,S*O].

The Pallas kernel variants are retained behind POSE_TPU_PALLAS_GCN=1 for
future Mosaic gather support; bf16 throughout (feature math, not solver
geometry — no HIGHEST precision).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Above this cloud size the one-hot matmul's O(N^2) flops overtake the
# gather's random-access penalty.
_ONEHOT_MAX_N = 2048


def _round_up(x, m):
    return (x + m - 1) // m * m


def gcn_aggregate(nd, dirs, feats, idx, support_num: int):
    """out[b,n,o] = sum_s max_k relu(nd . dirs)[k,s,o] * F[idx[n,k], s,o].

    nd [B,N,K,D] unit neighbor directions; dirs [D, S*O] normalized
    direction kernels; feats [B,M,S*O] support-feature table (None for
    ConvSurface, which aggregates theta alone); idx [B,N,K] neighbor ids
    into feats' second axis.
    """
    if (jax.default_backend() == "tpu"
            and os.environ.get("POSE_TPU_PALLAS_GCN") == "1"):
        fg = (None if feats is None else jnp.take_along_axis(
            feats[:, :, None, :], idx[..., None], axis=1))
        return _gcn_aggregate_fwd_pallas(nd, dirs, fg, support_num)
    return _fwd_xla(nd, dirs, feats, idx, support_num)


def gcn_aggregate_linear(nd, dirs, x, w_support, b_support,
                         idx, support_num: int):
    """ConvLayer aggregate with the support transform applied AFTER the
    neighbor gather: out[b,n,o] = sum_s max_k relu(nd.dirs)[k,s,o] *
    (X[nbr(n,k)] @ W + b)[s,o].

    Identical math to pre-transforming X at all M points and gathering
    the S*O-wide table (one-hot row selection commutes with the linear
    map), but the gather runs on the NARROW input (Cin) instead of the
    wide support table: at B=32, N=M=1024, K=10, Cin=128, S*O=896 the
    per-slot one-hot matmul drops from 60 to 8.6 GFLOP and the per-slot
    transform adds only 7.5 — 161 vs 600 GFLOP total for the measured
    5.7 ms hot aggregate of FusionNetLite's level-0 convs. Only called
    when Cin < S*O (ConvLayer picks the formulation).
    """
    dtype = x.dtype
    b, n, k, _ = nd.shape
    m = x.shape[1]
    nd = nd.astype(dtype)
    dirs = dirs.astype(dtype)
    w_support = w_support.astype(dtype)
    b_support = b_support.astype(dtype)
    s = support_num
    so = w_support.shape[-1]
    use_onehot = (m <= _ONEHOT_MAX_N and jax.default_backend() == "tpu")
    if use_onehot:
        iota = jnp.arange(m)
    acc = None
    for kk in range(k):
        theta = jax.nn.relu(jnp.einsum("bnd,dm->bnm", nd[:, :, kk], dirs))
        if use_onehot:
            onehot = (idx[:, :, kk, None] == iota[None, None, :]
                      ).astype(dtype)
            xg = jnp.einsum("bnm,bmc->bnc", onehot, x)
        else:
            xg = jnp.take_along_axis(x, idx[:, :, kk:kk + 1], axis=1)
        theta = theta * (xg @ w_support + b_support)
        acc = theta if acc is None else jnp.maximum(acc, theta)
    return acc.reshape(b, n, s, so // s).sum(axis=2).astype(jnp.float32)


def _fwd_xla(nd, dirs, feats, idx, support_num):
    dtype = feats.dtype if feats is not None else jnp.bfloat16
    b, n, k, d_dim = nd.shape
    so = dirs.shape[-1]
    s = support_num
    nd = nd.astype(dtype)
    dirs = dirs.astype(dtype)

    use_onehot = (feats is not None and feats.shape[1] <= _ONEHOT_MAX_N
                  and jax.default_backend() == "tpu")
    if use_onehot:
        iota = jnp.arange(feats.shape[1])

    acc = None
    for kk in range(k):
        theta = jax.nn.relu(jnp.einsum("bnd,dm->bnm", nd[:, :, kk], dirs))
        if feats is not None:
            if use_onehot:
                onehot = (idx[:, :, kk, None] == iota[None, None, :]
                          ).astype(dtype)
                fg_k = jnp.einsum("bnm,bmc->bnc", onehot, feats)
            else:
                fg_k = jnp.take_along_axis(feats, idx[:, :, kk:kk + 1],
                                           axis=1)
            theta = theta * fg_k
        acc = theta if acc is None else jnp.maximum(acc, theta)
    return acc.reshape(b, n, s, so // s).sum(axis=2).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pallas kernel variant (flag-gated; see module docstring for measurements)
# ---------------------------------------------------------------------------

def _agg_kernel(nd_ref, d_ref, fg_ref, o_ref, *, k: int, s: int, o: int,
                tile: int, with_features: bool):
    """One tile of points: theta (VPU FMAs; d=3 is useless on the MXU) ->
    relu -> (*Fg) -> running max over unrolled k -> sum_s."""
    d_dim = nd_ref.shape[-1]
    dirs = d_ref[...]
    acc = None
    for kk in range(k):
        nd_k = nd_ref[0, :, kk, :]
        theta = nd_k[:, 0:1] * dirs[0][None]
        for dd in range(1, d_dim):
            theta = theta + nd_k[:, dd:dd + 1] * dirs[dd][None]
        theta = jnp.maximum(theta, 0.0)
        if with_features:
            theta = theta * fg_ref[0, :, kk, :].astype(jnp.float32)
        acc = theta if acc is None else jnp.maximum(acc, theta)
    o_ref[0] = jnp.sum(acc.reshape(tile, s, o), axis=1)


@functools.partial(jax.jit, static_argnames=("support_num", "interpret"))
def _gcn_aggregate_fwd_pallas(nd, dirs, fg, support_num: int,
                              interpret: bool = False):
    b, n, k, d_dim = nd.shape
    so = dirs.shape[-1]
    s = support_num
    o = so // s
    tile = 64
    n_pad = _round_up(n, tile)
    if fg is not None:
        fg = fg.astype(jnp.bfloat16)
    if n_pad != n:
        nd = jnp.pad(nd, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
        if fg is not None:
            fg = jnp.pad(fg, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))

    with_features = fg is not None
    in_specs = [
        pl.BlockSpec((1, tile, k, d_dim), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((d_dim, so), lambda i, j: (0, 0)),
    ]
    args = [nd.astype(jnp.float32), dirs.astype(jnp.float32)]
    if with_features:
        in_specs.append(
            pl.BlockSpec((1, tile, k, so), lambda i, j: (i, j, 0, 0)))
        args.append(fg)
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0)))
        args.append(jnp.zeros((1, 1), jnp.float32))

    out = pl.pallas_call(
        functools.partial(_agg_kernel, k=k, s=s, o=o, tile=tile,
                          with_features=with_features),
        grid=(b, n_pad // tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, o), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, o), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out[:, :n]


def gcn_aggregate_multi(nds, dirs_list, feats_list, idx, support_num: int):
    """Multi-stream aggregation with a SHARED neighbor index: the 3 fusion
    streams (fusion.py uses one KNN graph per level, fusion.py:175) gather
    their support features with ONE one-hot matmul per neighbor slot on the
    concatenated feature tables, instead of 3 separate gathers — same
    flops, one big MXU op and one mask build instead of three.

    nds: list of [B,N,K,D] per-stream unit directions; dirs_list: list of
    [D, S*O]; feats_list: list of [B,M,S*O] (or None entries -> theta-only).
    Returns list of [B,N,O] outputs.
    """
    n_streams = len(nds)
    gathered = [None] * n_streams
    dense_ids = [i for i, f in enumerate(feats_list) if f is not None]
    b, n, k, _ = nds[0].shape
    s = support_num

    dtype = (feats_list[dense_ids[0]].dtype if dense_ids else jnp.bfloat16)
    use_onehot = (dense_ids
                  and feats_list[dense_ids[0]].shape[1] <= _ONEHOT_MAX_N
                  and jax.default_backend() == "tpu")

    accs = [None] * n_streams
    if dense_ids:
        cat = jnp.concatenate([feats_list[i] for i in dense_ids], axis=-1)
        widths = [feats_list[i].shape[-1] for i in dense_ids]
        offsets = [sum(widths[:j]) for j in range(len(widths))]
        iota = jnp.arange(cat.shape[1])

    for kk in range(k):
        if dense_ids:
            if use_onehot:
                onehot = (idx[:, :, kk, None] == iota[None, None, :]
                          ).astype(dtype)
                fg_cat = jnp.einsum("bnm,bmc->bnc", onehot, cat)
            else:
                fg_cat = jnp.take_along_axis(cat, idx[:, :, kk:kk + 1],
                                             axis=1)
        for si in range(n_streams):
            nd = nds[si].astype(dtype)
            dirs = dirs_list[si].astype(dtype)
            theta = jax.nn.relu(
                jnp.einsum("bnd,dm->bnm", nd[:, :, kk], dirs))
            if feats_list[si] is not None:
                j = dense_ids.index(si)
                fg = fg_cat[..., offsets[j]:offsets[j] + widths[j]]
                theta = theta * fg
            accs[si] = theta if accs[si] is None else jnp.maximum(
                accs[si], theta)

    outs = []
    for si in range(n_streams):
        so = dirs_list[si].shape[-1]
        outs.append(accs[si].reshape(b, n, s, so // s).sum(axis=2)
                    .astype(jnp.float32))
    return outs
