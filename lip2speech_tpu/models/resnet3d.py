"""3D-conv + ResNet-18 visual frontend.

TPU-native re-design of the mouth-ROI frontend used by every stage-1 variant:
reference espnet/nets/pytorch_backend/backbones/conv3d_extractor.py:25-101
(swish, conformer-only model) and avhubert/resnet.py:131-169 (prelu, AV-HuBERT).
Same math, channel-last layout: (B, T, H, W, 1) -> (B, T, 512).

The 3D stem runs once over time; the 2D trunk is applied with time folded into
the batch dim — a single big batched conv stream that XLA tiles onto the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lip2speech_tpu.models.layers import BatchNorm, Conv2d, Conv3d, PReLU
from lip2speech_tpu.ops import nn as ops


def _act(relu_type: str, features: int, name: str):
    """Activation dispatch; PReLU carries parameters and gets a stable name.
    (Must be called from inside an @nn.compact __call__ so the PReLU binds.)"""
    if relu_type == "prelu":
        return PReLU(features, name=name)
    if relu_type == "swish":
        return ops.swish
    return jax.nn.relu


class BasicBlock(nn.Module):
    """ResNet-18 basic block (conv3x3-BN-act-conv3x3-BN + residual)."""

    planes: int
    stride: int = 1
    relu_type: str = "swish"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        residual = x
        out = Conv2d(self.planes, (3, 3), (self.stride, self.stride), (1, 1),
                     use_bias=False, name="conv1")(x)
        out = BatchNorm(self.planes, name="bn1")(out, train)
        out = _act(self.relu_type, self.planes, "act1")(out)
        out = Conv2d(self.planes, (3, 3), (1, 1), (1, 1), use_bias=False, name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, train)
        if self.stride != 1 or in_planes != self.planes:
            residual = Conv2d(self.planes, (1, 1), (self.stride, self.stride), (0, 0),
                              use_bias=False, name="downsample_conv")(x)
            residual = BatchNorm(self.planes, name="downsample_bn")(residual, train)
        out = out + residual
        return _act(self.relu_type, self.planes, "act2")(out)


class ResNetTrunk(nn.Module):
    """Four stages of [2,2,2,2] basic blocks, 64->512, global avg pool."""

    relu_type: str = "swish"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for stage, (planes, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            for block in range(2):
                x = BasicBlock(planes, stride if block == 0 else 1, self.relu_type,
                               name=f"layer{stage + 1}_{block}")(x, train)
        return jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)


class ResNet3DFrontend(nn.Module):
    """(B, T, H, W, 1) grayscale mouth ROI -> (B, T, 512) per-frame features."""

    relu_type: str = "swish"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t = x.shape[0], x.shape[1]
        x = Conv3d(64, (5, 7, 7), (1, 2, 2), (2, 3, 3), use_bias=False,
                   name="stem_conv")(x)
        x = BatchNorm(64, name="stem_bn")(x, train)
        x = _act(self.relu_type, 64, "act")(x)
        x = ops.max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        # fold time into batch for the 2D trunk (one big MXU-friendly stream)
        h, w, c = x.shape[2], x.shape[3], x.shape[4]
        x = x.reshape(b * t, h, w, c)
        x = ResNetTrunk(self.relu_type, name="trunk")(x, train)
        return x.reshape(b, t, x.shape[-1])
