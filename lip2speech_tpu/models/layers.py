"""Flax linen wrappers around the torch-semantics ops in lip2speech_tpu.ops.nn.

Initializers reproduce torch defaults (kaiming_uniform(a=sqrt(5)) for
conv/linear) so from-scratch training matches the reference's init statistics;
converted checkpoints overwrite them anyway.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.ops import nn as ops


def torch_uniform_init(fan_in: int) -> Callable:
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_fan_out_init(fan_out: int) -> Callable:
    """torch nn.init.kaiming_normal_(mode='fan_out') — used by the reference's
    MLP head (model.py:278) and resnet conv init (resnet.py:93-95)."""
    std = np.sqrt(2.0 / fan_out)

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def normal_init(std: float = 0.01) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class Linear(nn.Module):
    """y = x @ W + b with torch layout mapping (weight stored (in, out))."""

    features: int
    use_bias: bool = True
    kernel_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kinit = self.kernel_init or torch_uniform_init(in_dim)
        w = self.param("weight", kinit, (in_dim, self.features))
        y = jnp.matmul(x, w)
        if self.use_bias:
            b = self.param("bias", torch_uniform_init(in_dim), (self.features,))
            y = y + b
        return y


class Conv1d(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        fan_in = (in_dim // self.groups) * self.kernel_size
        kinit = self.kernel_init or torch_uniform_init(fan_in)
        w = self.param("weight", kinit, (self.kernel_size, in_dim // self.groups, self.features))
        b = self.param("bias", torch_uniform_init(fan_in), (self.features,)) if self.use_bias else None
        return ops.conv1d(x, w, b, self.stride, self.padding, self.dilation, self.groups)


class ConvTranspose1d(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        fan_in = in_dim * self.kernel_size  # torch convtranspose fan_in (in_channels * k)
        kinit = self.kernel_init or torch_uniform_init(fan_in)
        w = self.param("weight", kinit, (self.kernel_size, self.features, in_dim))
        b = self.param("bias", torch_uniform_init(fan_in), (self.features,)) if self.use_bias else None
        return ops.conv_transpose1d(x, w, b, self.stride, self.padding)


class Conv2d(nn.Module):
    features: int
    kernel_size: Sequence[int]
    stride: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    dilation: Sequence[int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = (in_dim // self.groups) * kh * kw
        kinit = self.kernel_init or torch_uniform_init(fan_in)
        w = self.param("weight", kinit, (kh, kw, in_dim // self.groups, self.features))
        b = self.param("bias", torch_uniform_init(fan_in), (self.features,)) if self.use_bias else None
        return ops.conv2d(x, w, b, self.stride, self.padding, self.dilation, self.groups)


class Conv3d(nn.Module):
    features: int
    kernel_size: Sequence[int]
    stride: Sequence[int] = (1, 1, 1)
    padding: Sequence[int] = (0, 0, 0)
    use_bias: bool = False
    kernel_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kt, kh, kw = self.kernel_size
        fan_in = in_dim * kt * kh * kw
        kinit = self.kernel_init or torch_uniform_init(fan_in)
        w = self.param("weight", kinit, (kt, kh, kw, in_dim, self.features))
        b = self.param("bias", torch_uniform_init(fan_in), (self.features,)) if self.use_bias else None
        if (self.stride[0] == 1 and in_dim * kt <= 16
                and 2 * self.padding[0] == kt - 1):
            # Thin-channel stem: fold temporal taps into conv2d channels
            # (ops.conv3d_timestack). Measured on TPU v5e at train shapes
            # (b3 x T600 f32): fwd 19.2 -> 3.7 ms; BACKWARD 437 -> 19 ms —
            # XLA's conv3d dgrad/wgrad with Cin=1 is pathological. The
            # jax.checkpoint rematerializes the kt-x stacked input in the
            # backward instead of storing it (storing it OOMed the b6 x T600
            # recipe step); under inference it is a no-op.
            fn = jax.checkpoint(functools.partial(
                ops.conv3d_timestack, stride=self.stride, padding=self.padding))
            return fn(x, w, b)
        return ops.conv3d(x, w, b, self.stride, self.padding)


class BatchNorm(nn.Module):
    """torch.nn.BatchNorm{1,2,3}d over the trailing channel dim."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        gamma = self.param("weight", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "running_mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "running_var",
                               lambda: jnp.ones(self.features, jnp.float32))
        if train:
            y, new_mean, new_var = ops.batch_norm_train(
                x, ra_mean.value, ra_var.value, gamma, beta, self.eps, self.momentum)
            if not self.is_initializing():
                ra_mean.value = new_mean
                ra_var.value = new_var
            return y
        return ops.batch_norm(x, ra_mean.value, ra_var.value, gamma, beta, self.eps)


class LayerNorm(nn.Module):
    features: int
    eps: float = 1e-12  # ESPnet LayerNorm default

    @nn.compact
    def __call__(self, x):
        gamma = self.param("weight", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        return ops.layer_norm(x, gamma, beta, self.eps)


class PReLU(nn.Module):
    features: int = 1

    @nn.compact
    def __call__(self, x):
        alpha = self.param("weight", lambda k, s: jnp.full(s, 0.25, jnp.float32), (self.features,))
        return ops.prelu(x, alpha)


def activation(name: str, features: int | None = None):
    """Activation factory covering the reference's relu_type choices."""
    if name == "swish":
        return ops.swish
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return ops.gelu
    if name == "prelu":
        return PReLU(features=features or 1)
    raise ValueError(f"unknown activation {name!r}")
