"""HuBERT-base audio model — the speech-unit teacher.

Rebuild of the model behind the reference's unit-extraction pipeline
(avhubert/clustering/dump_hubert_feature.py:32-177: HuBERT-base layer-6
features -> k-means 200 -> .unt labels). fairseq wav2vec2/HuBERT semantics:

  conv feature extractor: 7 layers (512,10,5)(512,3,2)x4(512,2,2)x2, bias-free
    convs, GroupNorm(512) on layer 0 only ("default" mode), GELU  => 50 Hz
  layer_norm on features -> post_extract_proj (512 -> 768)
  transformer: 12 layers, d 768, ffn 3072, heads 12, POST-norm
    (layer_norm_first=False), conv positional embedding k128 g16
  `extract_features(output_layer=6)` returns the LAYER-6 activations.

Reuses the wav2vec2 transformer stack from models/avhubert.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lip2speech_tpu.models.avhubert import ConvPositionalEmbedding, TransformerLayer
from lip2speech_tpu.models.layers import LayerNorm, Linear
from lip2speech_tpu.ops import nn as ops

CONV_SPEC = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
             (512, 3, 2), (512, 2, 2), (512, 2, 2))


class GroupNorm512(nn.Module):
    """torch GroupNorm(512, 512) == per-channel instance norm over time."""

    features: int

    @nn.compact
    def __call__(self, x):  # (B, T, C), normalize each channel over T
        gamma = self.param("weight", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + 1e-5) * gamma + beta


class ConvFeatureExtractor(nn.Module):
    """(B, T_samples) -> (B, T/320, 512)."""

    @nn.compact
    def __call__(self, x):
        x = x[..., None]
        for i, (dim, k, stride) in enumerate(CONV_SPEC):
            in_dim = x.shape[-1]
            w = self.param(f"conv{i}_weight",
                           nn.initializers.he_normal(), (k, in_dim, dim))
            x = ops.conv1d(x, w, None, stride=stride)
            if i == 0:
                x = GroupNorm512(dim, name="group_norm")(x)
            x = ops.gelu(x)
        return x


class HubertBase(nn.Module):
    dim: int = 768
    heads: int = 12
    ffn_dim: int = 3072
    layers: int = 12

    @nn.compact
    def __call__(self, wav, output_layer: int | None = None, train: bool = False):
        """wav: (B, T_samples) float32 -> (B, T/320, 768) features.

        output_layer=6 reproduces the reference's unit-teacher features.
        """
        feats = ConvFeatureExtractor(name="feature_extractor")(wav)
        feats = LayerNorm(feats.shape[-1], eps=1e-5, name="layer_norm")(feats)
        x = Linear(self.dim, name="post_extract_proj")(feats)

        x = x + ConvPositionalEmbedding(self.dim, name="pos_conv")(x)
        # post-norm encoder: layer_norm applied before the layer stack
        x = LayerNorm(self.dim, eps=1e-5, name="encoder_layer_norm")(x)
        n = self.layers if output_layer is None else output_layer
        for i in range(self.layers):
            if i >= n:
                break
            x = TransformerLayer(self.dim, self.heads, self.ffn_dim, 0.1,
                                 layer_norm_first=False, name=f"layers_{i}")(
                x, None, deterministic=not train)
        return x
