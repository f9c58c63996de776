"""Equalized-learning-rate layers (StyleGAN-style).

Rebuild of version/transparent/lib/networks/equalized.py:45-100 (vendored
but only imported commented-out, TRPES.py:16-17): weights are initialized
N(0,1) and scaled at runtime by he_std = gain / sqrt(fan_in), equalizing
the effective per-layer learning rate. Provided as drop-in Dense/Conv.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax import random


class EqualizedDense(nn.Module):
    features: int
    gain: float = 2.0 ** 0.5
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        w = self.param("kernel", lambda k: random.normal(
            k, (fan_in, self.features)))
        scale = self.gain / (fan_in ** 0.5)
        y = x.astype(self.dtype) @ (w * scale).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class EqualizedConv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    gain: float = 2.0 ** 0.5
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel * self.kernel
        scale = self.gain / (fan_in ** 0.5)
        conv = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), use_bias=self.use_bias,
            kernel_init=nn.initializers.normal(1.0), dtype=self.dtype)
        # runtime weight scaling via a wrapper: scale input instead (conv is
        # linear, so scaling x by he_std equals scaling the kernel)
        return conv(x * scale)
