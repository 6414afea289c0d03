"""Conv1D-ResNet audio frontend (raw waveform -> 25 Hz features).

Rebuild of reference espnet/nets/pytorch_backend/backbones/conv1d_extractor.py
+ modules/resnet1d.py: crop to a 640-sample multiple, Conv1d(1->64, k80, s4,
p38) + BN + act, ResNet-18-style 1D trunk (strides 2 at stages 2-4), then
AvgPool1d(20/a_upsample_ratio) => total downsample 640/a. Completes the
espnet Encoder's input_layer="conv1d" option (audio branch).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lip2speech_tpu.models.layers import BatchNorm, Conv1d, PReLU
from lip2speech_tpu.ops import nn as ops


def _act(relu_type: str, features: int, name: str):
    if relu_type == "prelu":
        return PReLU(features, name=name)
    if relu_type == "swish":
        return ops.swish
    return jax.nn.relu


class BasicBlock1D(nn.Module):
    planes: int
    stride: int = 1
    relu_type: str = "swish"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        residual = x
        out = Conv1d(self.planes, 3, self.stride, 1, use_bias=False, name="conv1")(x)
        out = BatchNorm(self.planes, name="bn1")(out, train)
        out = _act(self.relu_type, self.planes, "act1")(out)
        out = Conv1d(self.planes, 3, 1, 1, use_bias=False, name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, train)
        if self.stride != 1 or in_planes != self.planes:
            residual = Conv1d(self.planes, 1, self.stride, 0, use_bias=False,
                              name="downsample_conv")(x)
            residual = BatchNorm(self.planes, name="downsample_bn")(residual, train)
        return _act(self.relu_type, self.planes, "act2")(out + residual)


class Conv1dResNetFrontend(nn.Module):
    """(B, T_samples, 1) raw 16 kHz audio -> (B, T/640*a, 512)."""

    relu_type: str = "swish"
    a_upsample_ratio: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = x.shape[1]
        x = x[:, : t // 640 * 640]
        x = Conv1d(64, 80, 4, 38, use_bias=False, name="stem_conv")(x)
        x = BatchNorm(64, name="stem_bn")(x, train)
        x = _act(self.relu_type, 64, "act")(x)
        for stage, (planes, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            for block in range(2):
                x = BasicBlock1D(planes, stride if block == 0 else 1,
                                 self.relu_type,
                                 name=f"trunk_layer{stage + 1}_{block}")(x, train)
        k = 20 // self.a_upsample_ratio
        return ops.avg_pool1d(x, k, k, 0)
