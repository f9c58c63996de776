"""Precision-pinned linear algebra helpers for geometry/solver code.

JAX's default matmul precision on TPU (and under some CPU plugins) lowers
matmul inputs to bfloat16-class precision — fine for the neural network's
big MXU matmuls, catastrophic for small 3x3 rotation algebra, PnP Jacobians,
and SVD covariance assembly (observed ~3.5e-3 error on a unit 3x3 product).
Everything in core/ uses these helpers so geometry stays at full float32
while the model remains free to run fast low-precision matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST

matmul = functools.partial(jnp.matmul, precision=HIGHEST)
einsum = functools.partial(jnp.einsum, precision=HIGHEST)
dot = functools.partial(jnp.dot, precision=HIGHEST)
