"""HRNet multi-resolution backbone, flax/NHWC.

From-scratch rebuild of the reference's modified HRNet
(lib/network/hrnet/myhrnet.py:258-527) with the stage topology of
lib/network/hrnet/config.yaml:1-45:

  stem: two stride-2 3x3 convs (64ch) + 4 Bottleneck(64) -> 256ch @ 1/4
  stage2: 1 module,  2 branches, 4 BasicBlocks, ch (96, 96)
  stage3: 4 modules, 3 branches, 3 BasicBlocks, ch (96, 96, 128)
  stage4: 3 modules, 4 branches, 3 BasicBlocks, ch (96, 96, 128, 256)

Outputs (myhrnet.py:511-527): branch features upsampled to 1/4 res and
concatenated (576ch), then
  feat_quarter: conv3x3(576)+conv1x1 -> backbone_outc @ 1/4 (the "x" output,
                consumed by XYZHead — models/krrn.py:123-125, matching the
                reference's krrn.py:94-95 wiring)
  feat_half:    deconv(576+outc -> outc, x2) + BasicBlock -> outc @ 1/2
                (the "y" output, consumed by NMLHead — models/krrn.py:126-127)

(SURVEY.md §1 erratum: its layer map describes these two head inputs
swapped; the wiring above is what the reference actually does,
myhrnet.py:511-527 + krrn.py:94-95.)

TPU-first deltas from the reference: NHWC, GroupNorm default (BatchNorm
parity option), single fused module list instead of torch ModuleList
indirection, bilinear resizes via jax.image.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pose_estimation_tpu.models.layers import (
    BasicBlock, Bottleneck, ConvNorm, ConvTransposeNorm, Norm,
    resize_bilinear)


DEFAULT_STAGES = (
    # (num_modules, num_blocks per branch, channels per branch)
    (1, 4, (96, 96)),
    (4, 3, (96, 96, 128)),
    (3, 3, (96, 96, 128, 256)),
)


class HRModule(nn.Module):
    """One HighResolutionModule (myhrnet.py:106-250): per-branch block
    stacks then full cross-resolution fusion (sum of up/down-sampled)."""

    channels: Sequence[int]
    num_blocks: int
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        nb = len(self.channels)
        feats = []
        for i in range(nb):
            y = xs[i]
            for _ in range(self.num_blocks):
                y = BasicBlock(self.channels[i], 1, self.norm, self.dtype)(
                    y, train)
            feats.append(y)

        fused = []
        for i in range(nb):
            acc = None
            for j in range(nb):
                if j == i:
                    y = feats[j]
                elif j > i:
                    # lower res -> conv1x1 + norm -> upsample to res i
                    y = ConvNorm(self.channels[i], 1, 1, False, self.norm,
                                 self.dtype)(feats[j], train)
                    y = resize_bilinear(y, feats[i].shape[1], feats[i].shape[2])
                else:
                    # higher res -> chain of stride-2 3x3 convs
                    y = feats[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        y = ConvNorm(ch, 3, 2, not last, self.norm,
                                     self.dtype)(y, train)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """Full backbone; returns (feat_quarter, feat_half)."""

    backbone_outc: int = 256
    stages: Tuple = DEFAULT_STAGES
    stem_width: int = 64
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Stem: 1/1 -> 1/4 (myhrnet.py:266-273)
        x = ConvNorm(self.stem_width, 3, 2, True, self.norm, self.dtype)(
            x, train)
        x = ConvNorm(self.stem_width, 3, 2, True, self.norm, self.dtype)(
            x, train)
        for _ in range(4):
            x = Bottleneck(self.stem_width, 1, self.norm, self.dtype)(x, train)
        feats = [x]  # 256ch @ 1/4

        prev_channels = (self.stem_width * 4,)
        for (num_modules, num_blocks, channels) in self.stages:
            # Transition (myhrnet.py:348-381): adapt channels / add branch.
            new_feats = []
            for i, ch in enumerate(channels):
                if i < len(prev_channels):
                    if prev_channels[i] != ch:
                        new_feats.append(ConvNorm(
                            ch, 3, 1, True, self.norm, self.dtype)(
                                feats[i], train))
                    else:
                        new_feats.append(feats[i])
                else:
                    # new lowest-res branch from the previous lowest
                    new_feats.append(ConvNorm(
                        ch, 3, 2, True, self.norm, self.dtype)(
                            feats[-1], train))
            feats = new_feats
            for _ in range(num_modules):
                feats = HRModule(channels, num_blocks, self.norm,
                                 self.dtype)(feats, train)
            prev_channels = channels

        # Heads (myhrnet.py:511-527)
        h, w = feats[0].shape[1], feats[0].shape[2]
        ups = [feats[0]] + [resize_bilinear(f, h, w) for f in feats[1:]]
        cat = jnp.concatenate(ups, axis=-1)  # 576ch @ 1/4

        inter = ConvNorm(cat.shape[-1], 3, 1, True, self.norm, self.dtype)(
            cat, train)
        feat_quarter = nn.Conv(self.backbone_outc, (1, 1),
                               dtype=self.dtype)(inter)

        y = jnp.concatenate([inter, feat_quarter], axis=-1)
        y = ConvTransposeNorm(self.backbone_outc, 4, self.norm,
                              self.dtype)(y, train)
        feat_half = BasicBlock(self.backbone_outc, 1, self.norm,
                               self.dtype)(y, train)
        return feat_quarter, feat_half
