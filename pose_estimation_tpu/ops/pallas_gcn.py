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

Round 5: the fused multi-stream Pallas kernels (gcn_aggregate_linear_multi,
gcn_surface_multi — see their section comments) moved the whole
k-slot chain into VMEM: level-0 hot aggregates 8.35 -> 4.48 ms, the 3
ConvSurfaces 2.72 -> 2.51 ms (device-loop, reps=30). They are the default
on real TPU; POSE_TPU_PALLAS_GCN=0 restores the XLA formulations, and
POSE_TPU_PALLAS_GCN_LEGACY=1 selects the r2-era per-stream kernel kept
for comparison. bf16 throughout (feature math, not solver geometry — no
HIGHEST precision).
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
            and os.environ.get("POSE_TPU_PALLAS_GCN_LEGACY") == "1"):
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
# Fused multi-stream narrow aggregate (the level-0 hot path, Pallas)
# ---------------------------------------------------------------------------
#
# The XLA k-loop above is HBM-bandwidth-bound, not FLOP-bound: every k
# slot materializes two [B,N,S*O] matmul outputs and reads+writes the
# [B,N,S*O] max-accumulator (XLA cannot fuse across the dot boundaries),
# ~7 GB of traffic for ~480 GFLOP across the 3 fusion streams at
# B=32, N=M=1024, K=10, Cin=128, S*O=896. The fused kernel keeps
# EVERYTHING on-chip per (batch, point-tile) grid cell:
#
#   - the 3 streams' concatenated input table X_cat [M, 3*Cin] (768 KB
#     bf16) lives in VMEM, re-used across the tile's K one-hot gathers;
#   - the per-slot one-hot mask is built in-register (VPU compare vs a
#     broadcasted iota) and immediately consumed by the MXU dot — it
#     never touches HBM;
#   - ONE gather matmul serves all 3 streams (the [TILE, M] mask is
#     shared; arithmetic intensity per mask tile triples);
#   - theta (direction response, d=3) is 3 VPU broadcast-FMAs — the MXU
#     would waste a 128-wide contraction on it;
#   - the running max over k stays in VMEM; only the final
#     sum-over-support [TILE, 3*O] leaves the chip.
#
# HBM traffic drops to inputs+outputs (~50 MB vs ~7 GB). Gradients go
# through a custom_vjp whose backward re-runs the XLA formulation
# (training throughput is not the bench gate; eval is).


def _linear_multi_xla(nds, dirs_list, xs, ws, bs, idx, support_num):
    """Reference/backward path: per-k shared gather on the concatenated
    narrow inputs, then per-stream transform/theta/max. Same math as
    `gcn_aggregate_linear` per stream; the gather one-hot (or
    take_along_axis off-TPU) is built once per slot instead of once per
    slot per stream."""
    streams = len(nds)
    b, n, k, _ = nds[0].shape
    s = support_num
    dtype = xs[0].dtype
    widths = [x.shape[-1] for x in xs]
    offs = [sum(widths[:j]) for j in range(streams)]
    cat = jnp.concatenate(xs, axis=-1)
    m = cat.shape[1]
    use_onehot = (m <= _ONEHOT_MAX_N and jax.default_backend() == "tpu")
    if use_onehot:
        iota = jnp.arange(m)
    accs = [None] * streams
    for kk in range(k):
        if use_onehot:
            onehot = (idx[:, :, kk, None] == iota[None, None, :]
                      ).astype(dtype)
            xg_cat = jnp.einsum("bnm,bmc->bnc", onehot, cat)
        else:
            xg_cat = jnp.take_along_axis(cat, idx[:, :, kk:kk + 1], axis=1)
        for si in range(streams):
            nd = nds[si].astype(dtype)
            theta = jax.nn.relu(
                jnp.einsum("bnd,dm->bnm", nd[:, :, kk],
                           dirs_list[si].astype(dtype)))
            xg = xg_cat[..., offs[si]:offs[si] + widths[si]]
            val = theta * (xg @ ws[si].astype(dtype)
                           + bs[si].astype(dtype))
            accs[si] = val if accs[si] is None else jnp.maximum(
                accs[si], val)
    return [a.reshape(b, n, s, -1).sum(axis=2).astype(jnp.float32)
            for a in accs]


def _linear_multi_kernel(idx_ref, nd_ref, x_ref, dirs_ref, w_ref, b_ref,
                         o_ref, *, k: int, s: int, streams: int, cin: int,
                         so: int, tile: int, m: int, vpu_theta: bool):
    """One (batch, point-tile) cell. nd_ref [1, tile, k*streams*3] bf16
    with layout [kk*streams*3 + si*3 + d]; x_ref [1, m, streams*cin];
    dirs_ref [streams*3, streams*so] BLOCK-DIAGONAL (theta for all
    streams of one slot is ONE MXU dot — the 9-wide contraction pads to
    128 regardless, so the off-diagonal zeros cost nothing and the VPU
    is left with only relu/mul/max); w_ref [streams, cin, so]; b_ref
    [streams, so]; o_ref [1, tile, streams*(so//s)]."""
    x_tab = x_ref[0]                                  # [m, streams*cin]
    idx_t = idx_ref[0]                                # [tile, k]
    ndm = nd_ref[0]                                   # [tile, k*streams*3]
    dirs_bd = dirs_ref[...]                           # [S*3, S*so]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, m), 1)
    s3 = streams * 3
    accs = [None] * streams

    def gather(kk):
        onehot = (idx_t[:, kk:kk + 1] == iota).astype(jnp.bfloat16)
        return jnp.dot(onehot, x_tab,
                       preferred_element_type=jnp.float32)

    # Software pipeline: the slot-(kk+1) gather dot is issued BEFORE
    # slot kk's VPU chain so the MXU runs a step ahead of the VPU.
    xg = gather(0)
    for kk in range(k):
        xg_next = gather(kk + 1) if kk + 1 < k else None
        if vpu_theta:
            # 3 broadcast-FMAs per stream instead of the padded MXU dot
            # (the 9-wide contraction pads to 128 — mostly wasted MXU)
            ths = []
            for si in range(streams):
                base = (kk * streams + si) * 3
                d0 = dirs_bd[si * 3:si * 3 + 3,
                             si * so:(si + 1) * so].astype(jnp.float32)
                ths.append(ndm[:, base:base + 1].astype(jnp.float32)
                           * d0[0:1, :]
                           + ndm[:, base + 1:base + 2].astype(jnp.float32)
                           * d0[1:2, :]
                           + ndm[:, base + 2:base + 3].astype(jnp.float32)
                           * d0[2:3, :])
            theta = jnp.concatenate(ths, axis=-1)
        else:
            theta = jnp.dot(ndm[:, kk * s3:(kk + 1) * s3], dirs_bd,
                            preferred_element_type=jnp.float32)
        theta = jnp.maximum(theta, 0.0)                   # [tile, S*so]
        for si in range(streams):
            sup = jnp.dot(
                xg[:, si * cin:(si + 1) * cin].astype(jnp.bfloat16),
                w_ref[si],
                preferred_element_type=jnp.float32) + b_ref[si:si + 1, :]
            val = theta[:, si * so:(si + 1) * so] * sup
            accs[si] = val if accs[si] is None else jnp.maximum(
                accs[si], val)
        xg = xg_next
    outs = [a.reshape(tile, s, so // s).sum(axis=1) for a in accs]
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _linear_pallas_core(idx, nd_flat, x_cat, dirs_bd, w_stack, b_stack,
                        *, support_num, vpu_theta, interpret):
    """The raw pallas_call on (possibly per-shard) batch-major arrays."""
    b, n, k = idx.shape
    streams = w_stack.shape[0]
    cin = w_stack.shape[1]
    so = w_stack.shape[2]
    m = x_cat.shape[1]
    s = support_num
    o = so // s
    tile = min(256, _round_up(n, 8))
    n_pad = _round_up(n, tile)
    if n_pad != n:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n), (0, 0)))
        nd_flat = jnp.pad(nd_flat, ((0, 0), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_linear_multi_kernel, k=k, s=s, streams=streams,
                          cin=cin, so=so, tile=tile, m=m,
                          vpu_theta=vpu_theta),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tile, k * streams * 3),
                         lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, m, streams * cin), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((streams * 3, streams * so),
                         lambda i, j: (0, 0)),
            pl.BlockSpec((streams, cin, so), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((streams, so), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, streams * o),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, streams * o),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(idx, nd_flat, x_cat, dirs_bd, w_stack, b_stack)
    return out[:, :n]


def _make_batch_partitioned(core_fn, rule, need_replication):
    """Wrap a batch-major kernel entry in custom_partitioning so DP/mesh
    sharding of the batch (and point) axes passes THROUGH the
    pallas_call instead of forcing an all-gather + replicated compute:
    without a rule, GSPMD/shardy treat the Mosaic custom-call as
    unpartitionable (measured: 18 all-gathers and a fully-replicated
    output for the level-0 kernel under a data-sharded jit). The rule
    shards factors `b` (batch) and `n` (points); every table/weight
    factor is marked need-replication. The per-shard lowering is just
    the kernel itself on local shapes (the grid/tiling adapt to any
    local b, n)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    cp = custom_partitioning(core_fn)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(*args):
            return core_fn(*args)
        return (mesh, lower_fn, result_shape.sharding,
                tuple(a.sharding for a in arg_shapes))

    def infer(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = getattr(arg_shapes[0].sharding, "spec", None)
        parts = list(spec) if spec is not None else []
        parts += [None] * 3
        return NamedSharding(mesh, P(parts[0], parts[1], None))

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     sharding_rule=rule,
                     need_replication_factors=need_replication)
    return cp


@functools.lru_cache(maxsize=None)
def _linear_cp(support_num: int, vpu_theta: bool, interpret: bool):
    core = functools.partial(_linear_pallas_core, support_num=support_num,
                             vpu_theta=vpu_theta, interpret=interpret)
    core_named = lambda idx, nd_flat, x_cat, dirs_bd, w_stack, b_stack: \
        core(idx, nd_flat, x_cat, dirs_bd, w_stack, b_stack)
    return _make_batch_partitioned(
        core_named,
        "b n k, b n f, b m c, s3 so, s cin so2, s so3 -> b n oo",
        ("k", "f", "m", "c", "s3", "so", "s", "cin", "so2", "so3", "oo"))


@functools.partial(jax.jit,
                   static_argnames=("support_num", "interpret",
                                    "vpu_theta"))
def _linear_multi_pallas(nd_flat, dirs_stack, x_cat, w_stack, b_stack,
                         idx, support_num: int, interpret: bool = False,
                         vpu_theta: bool = True):
    dirs_bd = _block_diag_dirs(dirs_stack)            # [S*3, S*so]
    return _linear_cp(support_num, vpu_theta, interpret)(
        idx, nd_flat.astype(jnp.bfloat16), x_cat.astype(jnp.bfloat16),
        dirs_bd, w_stack.astype(jnp.bfloat16), b_stack.astype(jnp.float32))


def _block_diag_dirs(dirs_stack):
    """[S, 3, so] -> block-diagonal [S*3, S*so] bf16: theta for all S
    streams of one neighbor slot becomes a single MXU dot."""
    streams, _, so = dirs_stack.shape
    eye = jnp.eye(streams, dtype=dirs_stack.dtype)
    # [S,3,S,so]: eye[s,s'] * dirs[s] placed at block (s, s')
    bd = eye[:, None, :, None] * dirs_stack[:, :, None, :]
    return bd.reshape(streams * 3, streams * so).astype(jnp.bfloat16)


def _linear_multi_tpu_impl(nds, dirs_list, xs, ws, bs, idx, support_num,
                           interpret=None):
    if interpret is None:  # compiled on TPU; interpret elsewhere (tests)
        interpret = jax.default_backend() != "tpu"
    streams = len(nds)
    b, n, k, _ = nds[0].shape
    # [B,N,K,S,3] -> [B,N,K*S*3]: flat layout the kernel slices by column.
    nd_flat = jnp.stack([nd.astype(jnp.float32) for nd in nds],
                        axis=3).reshape(b, n, k * streams * 3)
    dirs_stack = jnp.stack(dirs_list)
    x_cat = jnp.concatenate(xs, axis=-1)
    w_stack = jnp.stack(ws)
    b_stack = jnp.stack(bs)
    out = _linear_multi_pallas(
        nd_flat, dirs_stack, x_cat, w_stack, b_stack, idx, support_num,
        interpret=interpret,
        vpu_theta=os.environ.get("POSE_TPU_GCN_VPU_THETA", "1") == "1")
    o = out.shape[-1] // streams
    return [out[..., si * o:(si + 1) * o] for si in range(streams)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _linear_multi_tpu(support_num, nds, dirs_list, xs, ws, bs, idx):
    return _linear_multi_tpu_impl(nds, dirs_list, xs, ws, bs, idx,
                                  support_num)


def _linear_multi_fwd(support_num, nds, dirs_list, xs, ws, bs, idx):
    out = _linear_multi_tpu(support_num, nds, dirs_list, xs, ws, bs, idx)
    return out, (nds, dirs_list, xs, ws, bs, idx)


def _linear_multi_bwd(support_num, res, g):
    import numpy as np
    nds, dirs_list, xs, ws, bs, idx = res
    f = lambda a, b_, c, d, e: _linear_multi_xla(a, b_, c, d, e, idx,
                                                 support_num)
    grads = jax.vjp(f, nds, dirs_list, xs, ws, bs)[1](g)
    return (*grads, np.zeros(idx.shape, dtype=jax.dtypes.float0))


_linear_multi_tpu.defvjp(_linear_multi_fwd, _linear_multi_bwd)


def gcn_aggregate_linear_multi(nds, dirs_list, xs, ws, bs, idx,
                               support_num: int,
                               prefer_xla: bool = False):
    """Multi-stream ConvLayer aggregate with one shared neighbor gather:
    out_si[b,n,o] = sum_s max_k relu(nd_si . dirs_si)[k,s,o] *
    (X_si[nbr(n,k)] @ W_si + b_si)[s,o], for the streams si sharing one
    KNN graph (fusion.py level 0 — reference fusion.py:175).

    nds: list of [B,N,K,3]; dirs_list: list of [3,S*O] (pre-normalized);
    xs: list of [B,M,Cin] (equal Cin); ws: list of [Cin,(S*O)];
    bs: list of [S*O]; idx [B,N,K]. Returns a list of [B,N,O] float32.

    On real TPU this runs the fused Pallas kernel (VMEM-resident table +
    in-register one-hot; see the section comment); elsewhere, and for
    gradients, the XLA formulation.
    """
    uniform = (len({x.shape[-1] for x in xs}) == 1
               and len({w.shape[-1] for w in ws}) == 1)
    if (uniform and not prefer_xla and jax.default_backend() == "tpu"
            and os.environ.get("POSE_TPU_PALLAS_GCN", "1") != "0"):
        return _linear_multi_tpu(support_num, list(nds), list(dirs_list),
                                 list(xs), list(ws), list(bs), idx)
    return _linear_multi_xla(nds, dirs_list, xs, ws, bs, idx, support_num)


# ---------------------------------------------------------------------------
# Fused multi-stream theta-only aggregate (the 3 ConvSurfaces)
# ---------------------------------------------------------------------------
#
# ConvSurface has NO feature gather — out = sum_s max_k relu(nd . dirs)
# — yet the XLA k-loop still pays per-slot [B,N,S*O] einsum outputs and
# the max-accumulator round-trip through HBM. The kernel keeps the whole
# chain in VMEM: per slot, ONE block-diagonal MXU dot produces theta for
# all streams at once (the 9-wide contraction pads to 128 regardless, so
# the cross-stream zeros are free and the VPU is left with only
# relu + max), writing only the final [B,N,streams*O]. Measured faster
# than the VPU broadcast-FMA formulation here (3.84 vs 4.75 ms at
# reps=10) because no other MXU work competes in this kernel — the
# opposite trade from _linear_multi_kernel, whose MXU is busy with the
# gather and support dots.


def _surface_multi_xla(nds, dirs_list, support_num):
    return [_fwd_xla(nd, dirs, None, None, support_num)
            for nd, dirs in zip(nds, dirs_list)]


def _surface_multi_kernel(nd_ref, dirs_ref, o_ref, *, k: int, s: int,
                          streams: int, so: int, tile: int):
    """nd_ref [1, tile, k*streams*3] bf16; dirs_ref [streams*3,
    streams*so] block-diagonal (one MXU dot per slot covers all
    streams — see _linear_multi_kernel); VPU does only relu + max."""
    ndm = nd_ref[0]                                   # [tile, k*streams*3]
    dirs_bd = dirs_ref[...]
    s3 = streams * 3
    acc = None
    for kk in range(k):
        theta = jnp.dot(ndm[:, kk * s3:(kk + 1) * s3], dirs_bd,
                        preferred_element_type=jnp.float32)
        theta = jnp.maximum(theta, 0.0)               # [tile, S*so]
        acc = theta if acc is None else jnp.maximum(acc, theta)
    outs = [acc[:, si * so:(si + 1) * so].reshape(tile, s, so // s)
            .sum(axis=1) for si in range(streams)]
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _surface_pallas_core(nd_flat, dirs_bd, *, support_num, interpret):
    b, n, flat = nd_flat.shape
    streams = dirs_bd.shape[0] // 3
    so = dirs_bd.shape[1] // streams
    k = flat // (streams * 3)
    s = support_num
    o = so // s
    tile = min(256, _round_up(n, 8))
    n_pad = _round_up(n, tile)
    if n_pad != n:
        nd_flat = jnp.pad(nd_flat, ((0, 0), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_surface_multi_kernel, k=k, s=s,
                          streams=streams, so=so, tile=tile),
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, flat), lambda i, j: (i, j, 0)),
            pl.BlockSpec((streams * 3, streams * so),
                         lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, streams * o),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, streams * o),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(nd_flat, dirs_bd)
    return out[:, :n]


@functools.lru_cache(maxsize=None)
def _surface_cp(support_num: int, interpret: bool):
    core = functools.partial(_surface_pallas_core, support_num=support_num,
                             interpret=interpret)
    core_named = lambda nd_flat, dirs_bd: core(nd_flat, dirs_bd)
    return _make_batch_partitioned(
        core_named, "b n f, s3 so -> b n oo", ("f", "s3", "so", "oo"))


@functools.partial(jax.jit, static_argnames=("support_num", "interpret"))
def _surface_multi_pallas(nd_flat, dirs_stack, support_num: int,
                          interpret: bool = False):
    dirs_bd = _block_diag_dirs(dirs_stack)
    return _surface_cp(support_num, interpret)(
        nd_flat.astype(jnp.bfloat16), dirs_bd)


def _surface_multi_impl(nds, dirs_list, support_num, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    streams = len(nds)
    b, n, k, _ = nds[0].shape
    nd_flat = jnp.stack([nd.astype(jnp.float32) for nd in nds],
                        axis=3).reshape(b, n, k * streams * 3)
    dirs_stack = jnp.stack(dirs_list)
    out = _surface_multi_pallas(nd_flat, dirs_stack, support_num,
                                interpret=interpret)
    o = out.shape[-1] // streams
    return [out[..., si * o:(si + 1) * o] for si in range(streams)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _surface_multi_tpu(support_num, nds, dirs_list):
    return _surface_multi_impl(nds, dirs_list, support_num)


def _surface_multi_fwd(support_num, nds, dirs_list):
    return (_surface_multi_tpu(support_num, nds, dirs_list),
            (nds, dirs_list))


def _surface_multi_bwd(support_num, res, g):
    nds, dirs_list = res
    f = lambda a, b_: _surface_multi_xla(a, b_, support_num)
    return jax.vjp(f, nds, dirs_list)[1](g)


_surface_multi_tpu.defvjp(_surface_multi_fwd, _surface_multi_bwd)


def gcn_surface_multi(nds, dirs_list, support_num: int,
                      prefer_xla: bool = False):
    """Multi-stream ConvSurface aggregate:
    out_si[b,n,o] = sum_s max_k relu(<nd_si[b,n,k], dirs_si[:,s,o]>).

    nds: list of [B,N,K,3] unit neighbor directions; dirs_list: list of
    [3, S*O] normalized direction kernels. Returns list of [B,N,O] f32.
    Fused Pallas on real TPU; XLA formulation elsewhere and for grads.
    """
    if (not prefer_xla and jax.default_backend() == "tpu"
            and os.environ.get("POSE_TPU_PALLAS_GCN", "1") != "0"):
        return _surface_multi_tpu(support_num, list(nds), list(dirs_list))
    return _surface_multi_xla(nds, dirs_list, support_num)


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
