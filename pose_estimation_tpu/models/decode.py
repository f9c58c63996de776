"""Output decoding: region-classification -> coordinates, mask argmax.

Rebuild of the region-decoded coordinate reconstruction used by the
standalone eval (tools/script/eval.py:94-105: softmax-argmax region +
offsets) and the soft variant get_xyz (lib/network/loss_utils.py:19-29).

Note on the soft variant: the reference computes
  base = xyz_off + (softmax(region) * region_point).mean(dim=regions)
i.e. divides the softmax expectation by the region count (an extra 1/N) —
almost certainly unintended; we implement the true expectation (sum) and
keep the mean variant behind `reference_mean=True` for parity checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def decode_xyz_soft(xyz_off: jax.Array, region_logits: jax.Array,
                    region_points: jax.Array,
                    reference_mean: bool = False) -> jax.Array:
    """xyz_off [B,H,W,3] offsets, region_logits [B,H,W,R+1],
    region_points [B,R+1,3] (index 0 = background/origin) -> [B,H,W,3]."""
    w = jax.nn.softmax(region_logits, axis=-1)
    base = jnp.einsum("bhwr,brc->bhwc", w, region_points)
    if reference_mean:
        base = base / region_logits.shape[-1]
    return xyz_off + base


def decode_xyz_hard(xyz_off: jax.Array, region_logits: jax.Array,
                    region_points: jax.Array) -> jax.Array:
    """Argmax decoding (tools/script/eval.py:94-105)."""
    idx = jnp.argmax(region_logits, axis=-1)             # [B,H,W]
    onehot = jax.nn.one_hot(idx, region_logits.shape[-1],
                            dtype=xyz_off.dtype)
    base = jnp.einsum("bhwr,brc->bhwc", onehot, region_points)
    return xyz_off + base


def mask_argmax(mask_logits: jax.Array) -> jax.Array:
    """Multi-class mask logits [B,H,W,C+1] -> int mask [B,H,W]."""
    return jnp.argmax(mask_logits, axis=-1).astype(jnp.int32)
