"""Per-pixel map losses with invalid-pixel masking.

Rebuild of lib/network/loss_utils.py: the l1 / cosine / cross-entropy
per-pixel functions and MapLoss's masking rule — pixels whose target is
all-zero are invalid and excluded; the loss normalizes by the valid count.
NHWC layout (reference is NCHW); everything is jit/vmap-safe and static
shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def l1_map(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-pixel L1 summed over channels: [B,H,W,C] -> [B,H,W]
    (loss_utils.py:12-13)."""
    return jnp.sum(jnp.abs(pred - target), axis=-1)


def cosine_map(pred: jax.Array, target: jax.Array) -> jax.Array:
    """1 - cosine similarity along channels (loss_utils.py:8-10).

    Norms via core.mathsafe.safe_norm: `norm` has a NaN gradient at an
    exactly-zero prediction vector (common at background pixels), and the
    clamp on the product does not protect the backward."""
    from pose_estimation_tpu.core.mathsafe import safe_norm
    dot = jnp.sum(pred * target, axis=-1)
    np_ = safe_norm(pred, axis=-1)
    nt = safe_norm(target, axis=-1)
    return 1.0 - dot / jnp.maximum(np_ * nt, _EPS)


def ce_map(pred_logits: jax.Array, target_idx: jax.Array) -> jax.Array:
    """Per-pixel cross entropy; logits [B,H,W,C], labels [B,H,W] int
    (loss_utils.py:15-17 — note the reference adds eps inside the log)."""
    logp = jnp.log(jax.nn.softmax(pred_logits, axis=-1) + _EPS)
    picked = jnp.take_along_axis(logp, target_idx[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    return -picked


def masked_mean(per_pixel: jax.Array, valid: jax.Array) -> jax.Array:
    """Sum over valid pixels / number of valid pixels (loss_utils.py:57-63)."""
    total = jnp.sum(per_pixel * valid)
    count = jnp.maximum(jnp.sum(valid), 1.0)
    return total / count


def map_loss(kind: str, pred: jax.Array, target: jax.Array,
             valid: jax.Array | None = None) -> jax.Array:
    """MapLoss equivalent. kind in {'l1','cosine','ce'}.

    For 'l1'/'cosine': valid defaults to target != 0 on any channel (the
    reference's rule). For 'ce' an explicit `valid` mask is required when
    label 0 means background-but-valid (the reference's target==0 rule
    excludes label-0 pixels; we keep that default for parity).
    """
    if kind == "l1":
        pp = l1_map(pred, target)
        v = (jnp.any(target != 0, axis=-1) if valid is None else valid)
    elif kind == "cosine":
        pp = cosine_map(pred, target)
        v = (jnp.any(target != 0, axis=-1) if valid is None else valid)
    elif kind == "ce":
        pp = ce_map(pred, target)
        v = (target != 0 if valid is None else valid)
    else:
        raise ValueError(kind)
    return masked_mean(pp, v.astype(pp.dtype))
