"""Gradient-safe norms and normalization.

The recurring JAX trap: `x / jnp.maximum(jnp.linalg.norm(x), eps)` has a
NaN GRADIENT at x == 0 even though its value is fine — norm's backward is
x/|x| (0/0 at the origin) and `maximum`/`where` multiply the unselected
branch's cotangent by 0, which is NaN * 0 = NaN. ReLU feature maps hit
exactly-zero vectors routinely (every all-negative pre-activation pixel),
so one background pixel poisons the whole gradient and the trainer's
grad-finite guard then skips EVERY step — the transparent pipeline's
round-2 plateau was exactly this, wedged at loss ~0.09 with
skipped_nonfinite=1 forever (hunted at the stuck checkpoint: all loss
terms' gradients NaN'd inside the shared UNet trunk at unet.py:91).

The safe form clamps INSIDE the sqrt: sqrt(max(|x|^2, eps^2)) has a
finite gradient everywhere (at |x|^2 < eps^2 the max selects the
constant branch, so the sqrt contributes no gradient at all).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_norm(x: jax.Array, axis=-1, keepdims: bool = False,
              eps: float = 1e-8) -> jax.Array:
    """L2 norm with finite gradients at x == 0 (returns >= eps)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def safe_normalize(x: jax.Array, axis=-1, eps: float = 1e-8) -> jax.Array:
    """x / max(|x|, eps) with finite gradients at x == 0.

    Matches F.normalize semantics on the value (zero vectors stay ~zero)
    while keeping the backward finite.
    """
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)
