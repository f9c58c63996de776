"""Shared flax building blocks for all model families.

Conventions (TPU-first, deliberately different from the torch reference):
- NHWC layout everywhere (XLA:TPU's native conv layout);
- GroupNorm by default instead of BatchNorm — no cross-device sync needed
  under data parallelism (the reference needed NCCL SyncBatchNorm,
  version/transparent/train.py:1278-1279); BatchNorm remains available as a
  parity option ("bn") using flax batch_stats;
- a `dtype` knob for bfloat16 activations with float32 params.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def resize_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    """NHWC bilinear resize (replaces F.interpolate, myhrnet.py:513-515)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="bilinear")


def upsample2x(x: jax.Array) -> jax.Array:
    return resize_bilinear(x, x.shape[1] * 2, x.shape[2] * 2)


class Norm(nn.Module):
    """Switchable normalization: 'gn' (default) or 'bn'."""

    kind: str = "gn"
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "bn":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                dtype=self.dtype)(x)
        g = min(self.groups, x.shape[-1])
        while x.shape[-1] % g:
            g -= 1
        return nn.GroupNorm(num_groups=g, dtype=self.dtype)(x)


class ConvNorm(nn.Module):
    """Conv + Norm + optional ReLU (the torch conv/bn/relu triplet)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_relu: bool = True
    norm: str = "gn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), use_bias=False,
                    dtype=self.dtype)(x)
        x = Norm(self.norm, dtype=self.dtype)(x, train)
        if self.use_relu:
            x = nn.relu(x)
        return x


class ConvTransposeNorm(nn.Module):
    """ConvTranspose stride-2 + Norm + ReLU (torch ConvTranspose2d(4,2,1))."""

    features: int
    kernel: int = 4
    norm: str = "gn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.features, (self.kernel, self.kernel),
                             strides=(2, 2), padding="SAME", use_bias=False,
                             dtype=self.dtype)(x)
        x = Norm(self.norm, dtype=self.dtype)(x, train)
        return nn.relu(x)


class BasicBlock(nn.Module):
    """HRNet BasicBlock (myhrnet.py:34-63): two 3x3 convs + residual."""

    features: int
    stride: int = 1
    norm: str = "gn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvNorm(self.features, 3, self.stride, True, self.norm,
                     self.dtype)(x, train)
        y = ConvNorm(self.features, 3, 1, False, self.norm, self.dtype)(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = ConvNorm(self.features, 1, self.stride, False,
                                self.norm, self.dtype)(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """HRNet Bottleneck (myhrnet.py:65-103): 1x1 -> 3x3 -> 1x1 (x4)."""

    features: int  # inner width; output = 4 * features
    stride: int = 1
    norm: str = "gn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * 4
        residual = x
        y = ConvNorm(self.features, 1, 1, True, self.norm, self.dtype)(x, train)
        y = ConvNorm(self.features, 3, self.stride, True, self.norm,
                     self.dtype)(y, train)
        y = ConvNorm(out_ch, 1, 1, False, self.norm, self.dtype)(y, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = ConvNorm(out_ch, 1, self.stride, False, self.norm,
                                self.dtype)(x, train)
        return nn.relu(y + residual)


class MLP1d(nn.Module):
    """Per-point MLP — the reference's Conv1d(k=1) stacks as dense layers
    applied along the channel axis of [B, N, C] tensors."""

    features: Sequence[int]
    norm: str | None = "gn"
    final_act: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype)(x)
            last = i == len(self.features) - 1
            if not last or self.final_act:
                if self.norm:
                    x = Norm(self.norm, dtype=self.dtype)(x, train)
                x = nn.relu(x)
        return x
