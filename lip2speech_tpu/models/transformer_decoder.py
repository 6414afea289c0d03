"""Transformer decoder for seq2seq ASR fine-tuning.

Rebuild of reference avhubert/decoder.py:38-253 (fairseq TransformerDecoder
used by AVHubertSeq2Seq, hubert_asr.py:411-516): scaled token embedding +
sinusoidal positions, pre-norm layers of (causal self-attn, cross-attn to the
encoder, FFN), shared input/output embedding option.

TPU-native decoding uses a fixed-size KV-free formulation: at each beam step
the full prefix is re-encoded under a causal mask (static shapes; the
sequences here are <= ~50 tokens so recompute beats dynamic caches on TPU).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.models.layers import LayerNorm, Linear
from lip2speech_tpu.ops import nn as ops


def sinusoidal_positions(length: int, dim: int, padding_idx: int = 1) -> np.ndarray:
    """fairseq SinusoidalPositionalEmbedding table (offset by padding_idx+1)."""
    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    emb = np.exp(np.arange(half, dtype=np.float64) * -emb)
    pos = np.arange(padding_idx + 1, padding_idx + 1 + length, dtype=np.float64)
    ang = pos[:, None] * emb[None, :]
    out = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        out = np.concatenate([out, np.zeros((length, 1))], axis=1)
    return out.astype(np.float32)


class CrossAttention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, kv, kv_mask=None, causal: bool = False):
        b, t, d = x.shape
        h, dk = self.heads, d // self.heads
        q = Linear(d, name="q_proj")(x).reshape(b, t, h, dk)
        k = Linear(d, name="k_proj")(kv).reshape(b, kv.shape[1], h, dk)
        v = Linear(d, name="v_proj")(kv).reshape(b, kv.shape[1], h, dk)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / float(np.sqrt(dk))
        if kv_mask is not None:
            s = jnp.where(kv_mask[:, None, None, :], s, -1e9)
        if causal:
            tri = jnp.tril(jnp.ones((t, kv.shape[1]), bool))
            s = jnp.where(tri[None, None], s, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
        return Linear(d, name="out_proj")(out)


class DecoderLayer(nn.Module):
    dim: int
    heads: int
    ffn_dim: int

    @nn.compact
    def __call__(self, x, enc, enc_mask):
        y = LayerNorm(self.dim, eps=1e-5, name="self_attn_layer_norm")(x)
        x = x + CrossAttention(self.dim, self.heads, name="self_attn")(
            y, y, causal=True)
        y = LayerNorm(self.dim, eps=1e-5, name="encoder_attn_layer_norm")(x)
        x = x + CrossAttention(self.dim, self.heads, name="encoder_attn")(
            y, enc, enc_mask)
        y = LayerNorm(self.dim, eps=1e-5, name="final_layer_norm")(x)
        y = Linear(self.ffn_dim, name="fc1")(y)
        y = ops.gelu(y)
        return x + Linear(self.dim, name="fc2")(y)


class TransformerDecoder(nn.Module):
    vocab_size: int
    dim: int = 768
    heads: int = 4
    ffn_dim: int = 3072
    layers: int = 6
    max_positions: int = 2048
    share_embed: bool = True
    padding_idx: int = 1

    @nn.compact
    def __call__(self, tokens, enc, enc_mask):
        """tokens: (B, L) int32 prefix; enc: (B, Te, D) encoder out.

        Returns (B, L, vocab) logits.
        """
        emb_table = self.param("embed_tokens", nn.initializers.normal(self.dim ** -0.5),
                               (self.vocab_size, self.dim))
        x = emb_table[tokens] * float(np.sqrt(self.dim))
        pos = sinusoidal_positions(self.max_positions, self.dim, self.padding_idx)
        x = x + jnp.asarray(pos)[: tokens.shape[1]]
        for i in range(self.layers):
            x = DecoderLayer(self.dim, self.heads, self.ffn_dim,
                             name=f"layers_{i}")(x, enc, enc_mask)
        x = LayerNorm(self.dim, eps=1e-5, name="layer_norm")(x)
        if self.share_embed:
            return x @ emb_table.T
        out = self.param("output_proj", nn.initializers.normal(self.dim ** -0.5),
                         (self.dim, self.vocab_size))
        return x @ out
