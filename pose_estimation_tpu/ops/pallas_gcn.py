"""Pallas TPU kernel for the 3D-GCN aggregation hot loop.

The gcn3d convolutions (models/gcn3d.py, rebuilt from
lib/network/point/gcn3d.py:72-216) compute, per point n with k neighbors:

    out[n, o] = sum_s max_k relu(<dir_nk, D[:, s, o]>) * F[nbr(n, k), s, o]

Under plain XLA the theta tensor [B, N, K, S*O] (~587 MB at the KRRN
shapes) and the theta*F product both materialize in HBM — profiled at
10.4 ms per ConvLayer on v5e, ~3x the pure-bandwidth bound, and the fusion
block dominated the whole forward (59 of 113 ms). This kernel computes
theta and the product tile-wise in VMEM; only the XLA-native neighbor
gather of F still touches HBM.

Forward: pallas. Backward: custom_vjp recomputing theta with XLA ops (the
training step is throughput-bound on other parts; eval needs only forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _agg_kernel(nd_ref, d_ref, fg_ref, o_ref, *, k: int, s: int, o: int,
                tile: int, with_features: bool):
    """One tile of points: theta -> relu -> (*Fg) -> max_k -> sum_s.

    theta is a d=3 contraction — useless on the 128x128 MXU (2%
    utilization); computed instead as d broadcast FMAs on the VPU. The
    k-neighbor axis is unrolled to keep every intermediate at (tile, s*o).
    """
    d_dim = nd_ref.shape[-1]
    dirs = d_ref[...]                              # (d, s*o)
    acc = None
    for kk in range(k):
        nd_k = nd_ref[0, :, kk, :]                 # (tile, d)
        theta = nd_k[:, 0:1] * dirs[0][None]
        for dd in range(1, d_dim):
            theta = theta + nd_k[:, dd:dd + 1] * dirs[dd][None]
        theta = jnp.maximum(theta, 0.0)            # (tile, s*o)
        if with_features:
            theta = theta * fg_ref[0, :, kk, :].astype(jnp.float32)
        acc = theta if acc is None else jnp.maximum(acc, theta)
    act = acc.reshape(tile, s, o)
    o_ref[0] = jnp.sum(act, axis=1)


@functools.partial(jax.jit, static_argnames=("support_num", "interpret"))
def _gcn_aggregate_fwd_pallas(nd, dirs, fg, support_num: int,
                              interpret: bool = False):
    b, n, k, d_dim = nd.shape
    so = dirs.shape[-1]
    s = support_num
    o = so // s
    tile = 64  # (T*k, s*o) f32 theta + Fg block must fit VMEM (~16MB)
    n_pad = _round_up(n, tile)
    if fg is not None:
        fg = fg.astype(jnp.bfloat16)  # halve the VMEM block
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
        # dummy scalar input keeps the kernel arity static
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


def _theta_xla(nd, dirs, dtype=jnp.bfloat16):
    # Feature-path math: bf16 throughout. HIGHEST precision here would
    # upconvert the [B,N,K,S*O] theta tensor to multi-pass f32 — doubling
    # the HBM traffic of the hottest tensor in the model for no benefit
    # (these are learned features, not solver geometry).
    return jax.nn.relu(jnp.einsum(
        "bnkd,dm->bnkm", nd.astype(dtype), dirs.astype(dtype)))


def _fwd_xla(nd, dirs, fg, support_num):
    dtype = fg.dtype if fg is not None else jnp.bfloat16
    theta = _theta_xla(nd, dirs, dtype)
    b, n, k, so = theta.shape
    s = support_num
    act = theta if fg is None else theta * fg
    act = act.reshape(b, n, k, s, so // s)
    return jnp.sum(jnp.max(act, axis=2), axis=2).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gcn_aggregate(nd, dirs, fg, support_num: int):
    """out[b,n,o] = sum_s max_k relu(nd . dirs)[k,s,o] (* fg[k,s,o]).

    nd [B,N,K,D] unit neighbor directions; dirs [D, S*O] normalized
    direction kernels; fg [B,N,K,S*O] gathered support features or None
    (ConvSurface).

    MEASURED OUTCOME (v5e, B=32 N=1024 K=10 S=7 O=128): XLA's fused
    einsum+max lowering runs the ConvLayer in 10.4 ms; this Pallas kernel
    (two formulations: MXU dot and VPU FMA-unrolled) measured 12.8 / 14.8
    ms — the XLA-native neighbor gather plus block layout conversions
    dominate, so the hand kernel does NOT pay off on this toolchain.
    XLA is therefore the default; set POSE_TPU_PALLAS_GCN=1 to use the
    kernel (kept for future Mosaic gather support, where the feature table
    could stay VMEM-resident and skip the gather materialization).
    """
    import os
    if (jax.default_backend() == "tpu"
            and os.environ.get("POSE_TPU_PALLAS_GCN") == "1"):
        return _gcn_aggregate_fwd_pallas(nd, dirs, fg, support_num)
    return _fwd_xla(nd, dirs, fg, support_num)


def _vjp_fwd(nd, dirs, fg, support_num):
    return gcn_aggregate(nd, dirs, fg, support_num), (nd, dirs, fg)


def _vjp_bwd(support_num, res, g):
    # Recompute-theta backward in plain XLA: materializes the big tensors
    # only on the training path, where the step is dominated elsewhere.
    nd, dirs, fg = res

    def f(nd_, dirs_, fg_):
        return _fwd_xla(nd_, dirs_, fg_, support_num)

    if fg is None:
        _, vjp = jax.vjp(lambda a, b: f(a, b, None), nd, dirs)
        gnd, gdirs = vjp(g)
        return gnd, gdirs, None
    _, vjp = jax.vjp(f, nd, dirs, fg)
    return vjp(g)


gcn_aggregate.defvjp(_vjp_fwd, _vjp_bwd)
