"""ShuffleNetV2 trunk — the lightweight video-frontend option.

Rebuild of reference espnet .../backbones/modules/shufflenetv2.py:26-175 as
used by Conv3dResNet(backbone_type="shufflenet") (conv3d_extractor.py:46-57):
the 3D stem outputs 24 channels, then stages [4, 8, 4] of InvertedResidual
blocks (split/shuffle units), conv_last 1x1 -> 1024, global avg pool.
Channel-last; channel_shuffle(groups=2) is a reshape/transpose pair.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lip2speech_tpu.models.layers import BatchNorm, Conv2d, Conv3d
from lip2speech_tpu.ops import nn as ops

STAGE_REPEATS = (4, 8, 4)
STAGE_CHANNELS = {0.5: (48, 96, 192, 1024), 1.0: (116, 232, 464, 1024),
                  1.5: (176, 352, 704, 1024), 2.0: (244, 488, 976, 2048)}


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> shuffled channels (torch view/transpose equivalent)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(b, h, w, c)


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, (self.kernel, self.kernel),
                   (self.stride, self.stride), (self.padding, self.padding),
                   groups=self.groups, use_bias=False, name="conv")(x)
        x = BatchNorm(self.features, name="bn")(x, train)
        return jax.nn.relu(x) if self.relu else x


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    downsample: bool  # benchmodel 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.out_channels // 2
        if not self.downsample:
            x1, x2 = jnp.split(x, 2, axis=-1)
            y = _ConvBNRelu(half, 1, name="b2_pw1")(x2, train)
            y = _ConvBNRelu(half, 3, self.stride, 1, groups=half, relu=False,
                            name="b2_dw")(y, train)
            y = _ConvBNRelu(half, 1, name="b2_pw2")(y, train)
            out = jnp.concatenate([x1, y], axis=-1)
        else:
            in_ch = x.shape[-1]
            b1 = _ConvBNRelu(in_ch, 3, self.stride, 1, groups=in_ch, relu=False,
                             name="b1_dw")(x, train)
            b1 = _ConvBNRelu(half, 1, name="b1_pw")(b1, train)
            b2 = _ConvBNRelu(half, 1, name="b2_pw1")(x, train)
            b2 = _ConvBNRelu(half, 3, self.stride, 1, groups=half, relu=False,
                             name="b2_dw")(b2, train)
            b2 = _ConvBNRelu(half, 1, name="b2_pw2")(b2, train)
            out = jnp.concatenate([b1, b2], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2Trunk(nn.Module):
    """(N, H, W, 24) post-stem feature maps -> (N, out_dim) pooled features."""

    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = STAGE_CHANNELS[self.width_mult]
        for stage, (reps, out_ch) in enumerate(zip(STAGE_REPEATS, chans[:3])):
            for i in range(reps):
                x = InvertedResidual(out_ch, 2 if i == 0 else 1, i == 0,
                                     name=f"stage{stage + 2}_{i}")(x, train)
        x = _ConvBNRelu(chans[3], 1, name="conv_last")(x, train)
        return jnp.mean(x, axis=(1, 2))


class ShuffleNet3DFrontend(nn.Module):
    """Conv3dResNet(backbone_type='shufflenet'):
    (B, T, H, W, 1) -> (B, T, 1024)."""

    width_mult: float = 1.0
    relu_type: str = "swish"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t = x.shape[0], x.shape[1]
        x = Conv3d(24, (5, 7, 7), (1, 2, 2), (2, 3, 3), use_bias=False,
                   name="stem_conv")(x)
        x = BatchNorm(24, name="stem_bn")(x, train)
        x = ops.swish(x) if self.relu_type == "swish" else jax.nn.relu(x)
        x = ops.max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        h, w, c = x.shape[2], x.shape[3], x.shape[4]
        x = x.reshape(b * t, h, w, c)
        x = ShuffleNetV2Trunk(self.width_mult, name="trunk")(x, train)
        return x.reshape(b, t, x.shape[-1])
