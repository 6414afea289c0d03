"""VQ bottleneck + jukebox-style conv encoder/decoder (the f0-VQ stack).

Rebuild of reference speech-resynthesis/modules/{vq.py:11-249, jukebox.py:
12-178, resnet.py:9-82}: an EMA k-means vector quantizer with
straight-through gradients and restart-on-dead-codes, plus strided conv
encoder/decoder blocks. Unused by the exercised lrs3 configs but part of the
CodeGenerator's optional f0/code VQ paths (models.py:137-156).

The EMA state lives in the 'vq_stats' mutable collection.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lip2speech_tpu.models.layers import Conv1d, ConvTranspose1d
from lip2speech_tpu.ops import nn as ops


class VQBottleneck(nn.Module):
    """EMA k-means VQ over (B, T, D) latents."""

    codebook_size: int = 64
    dim: int = 128
    mu: float = 0.99          # EMA decay (reference l_mu)
    threshold: float = 1.0    # dead-code usage threshold

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Returns (codes (B,T) int32, quantized (B,T,D), commit_loss, metrics)."""
        k = self.variable("vq_stats", "codebook",
                          lambda: jax.random.normal(jax.random.PRNGKey(0),
                                                    (self.codebook_size, self.dim)))
        ema_count = self.variable("vq_stats", "ema_count",
                                  lambda: jnp.ones(self.codebook_size))
        ema_sum = self.variable("vq_stats", "ema_sum", lambda: k.value.copy())

        flat = x.reshape(-1, self.dim)
        d = (jnp.sum(flat**2, 1, keepdims=True)
             - 2 * flat @ k.value.T + jnp.sum(k.value**2, 1))
        codes = jnp.argmin(d, axis=1)
        quantized = k.value[codes].reshape(x.shape)

        commit = jnp.mean(jnp.square(x - jax.lax.stop_gradient(quantized)))
        # straight-through
        quantized_st = x + jax.lax.stop_gradient(quantized - x)

        one_hot = jax.nn.one_hot(codes, self.codebook_size, dtype=x.dtype)
        usage = one_hot.sum(0)
        if train and not self.is_initializing():
            new_count = self.mu * ema_count.value + (1 - self.mu) * usage
            new_sum = self.mu * ema_sum.value + (1 - self.mu) * (one_hot.T @ flat)
            new_k = new_sum / jnp.maximum(new_count[:, None], 1e-5)
            # restart dead codes at random encoder outputs
            dead = new_count < self.threshold * usage.sum() / (
                self.codebook_size * 20.0)
            rng = jax.random.PRNGKey(0)
            rand_idx = jax.random.randint(rng, (self.codebook_size,), 0, flat.shape[0])
            new_k = jnp.where(dead[:, None], flat[rand_idx], new_k)
            k.value = jax.lax.stop_gradient(new_k)
            ema_count.value = jax.lax.stop_gradient(new_count)
            ema_sum.value = jax.lax.stop_gradient(new_sum)

        probs = usage / jnp.maximum(usage.sum(), 1.0)
        entropy = -jnp.sum(probs * jnp.log(jnp.maximum(probs, 1e-8)))
        metrics = {"entropy": entropy,
                   "used_codes": jnp.sum(usage > 0).astype(jnp.float32)}
        return codes.reshape(x.shape[:-1]), quantized_st, commit, metrics


class VQEncoder(nn.Module):
    """Jukebox-style strided conv encoder: (B, T, 1) -> (B, T/prod(s), D)."""

    dim: int = 128
    strides: tuple = (4, 4)

    @nn.compact
    def __call__(self, x):
        for i, s in enumerate(self.strides):
            x = Conv1d(self.dim, 2 * s, s, s // 2, name=f"down_{i}")(x)
            x = jax.nn.relu(x)
            r = Conv1d(self.dim, 3, 1, 1, name=f"res_{i}a")(x)
            r = jax.nn.relu(r)
            r = Conv1d(self.dim, 1, 1, 0, name=f"res_{i}b")(r)
            x = x + r
        return x


class VQDecoder(nn.Module):
    """(B, T, D) -> (B, T*prod(s), out_dim)."""

    dim: int = 128
    out_dim: int = 1
    strides: tuple = (4, 4)

    @nn.compact
    def __call__(self, x):
        for i, s in enumerate(reversed(self.strides)):
            r = Conv1d(self.dim, 3, 1, 1, name=f"res_{i}a")(x)
            r = jax.nn.relu(r)
            r = Conv1d(self.dim, 1, 1, 0, name=f"res_{i}b")(r)
            x = x + r
            x = ConvTranspose1d(self.dim, 2 * s, s, s // 2, name=f"up_{i}")(x)
            x = jax.nn.relu(x)
        return Conv1d(self.out_dim, 3, 1, 1, name="out")(x)


class VQQuantizer(nn.Module):
    """Encoder -> VQ -> Decoder (the reference Quantizer, models.py:340-353)."""

    dim: int = 128
    codebook_size: int = 64
    strides: tuple = (4, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = VQEncoder(self.dim, self.strides, name="encoder")(x)
        codes, q, commit, metrics = VQBottleneck(
            self.codebook_size, self.dim, name="vq")(h, train)
        recon = VQDecoder(self.dim, x.shape[-1], self.strides, name="decoder")(q)
        return recon, codes, commit, metrics
