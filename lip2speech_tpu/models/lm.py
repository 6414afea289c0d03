"""Transformer language model + shallow fusion for beam decoding.

Rebuild of the reference's LM stack used by the RAVEn ASR eval harness
(raven/_espnet/nets/{transformer_lm, scorers}, SURVEY.md §2.4): a causal
transformer LM whose log-probs are fused into the beam search scores
(score = am + lm_weight * lm), the standard shallow-fusion scorer.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.models.layers import LayerNorm, Linear
from lip2speech_tpu.models.transformer_decoder import sinusoidal_positions
from lip2speech_tpu.ops import nn as ops


class LMLayer(nn.Module):
    dim: int
    heads: int
    ffn_dim: int

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        h, dk = self.heads, d // self.heads
        y = LayerNorm(self.dim, eps=1e-5, name="attn_norm")(x)
        q = Linear(d, name="q_proj")(y).reshape(b, t, h, dk)
        k = Linear(d, name="k_proj")(y).reshape(b, t, h, dk)
        v = Linear(d, name="v_proj")(y).reshape(b, t, h, dk)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / float(np.sqrt(dk))
        tri = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(tri[None, None], s, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        att = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
        x = x + Linear(d, name="out_proj")(att)
        y = LayerNorm(self.dim, eps=1e-5, name="ffn_norm")(x)
        y = Linear(self.ffn_dim, name="fc1")(y)
        y = ops.gelu(y)
        return x + Linear(self.dim, name="fc2")(y)


class TransformerLM(nn.Module):
    vocab_size: int
    dim: int = 512
    heads: int = 8
    ffn_dim: int = 2048
    layers: int = 6
    max_positions: int = 1024

    @nn.compact
    def __call__(self, tokens):
        """(B, L) -> (B, L, V) next-token logits."""
        emb = self.param("embed", nn.initializers.normal(self.dim ** -0.5),
                         (self.vocab_size, self.dim))
        x = emb[tokens] * float(np.sqrt(self.dim))
        pos = sinusoidal_positions(self.max_positions, self.dim)
        x = x + jnp.asarray(pos)[: tokens.shape[1]]
        for i in range(self.layers):
            x = LMLayer(self.dim, self.heads, self.ffn_dim, name=f"layers_{i}")(x)
        x = LayerNorm(self.dim, eps=1e-5, name="norm")(x)
        return x @ emb.T


def fuse_with_lm(am_score_prefix, lm: TransformerLM, lm_variables,
                 lm_weight: float = 0.3):
    """Wrap an acoustic score_prefix with LM shallow fusion for beam_search."""

    def fused(tokens, step):
        am = jax.nn.log_softmax(am_score_prefix(tokens, step), axis=-1)
        lm_logits = lm.apply(lm_variables, tokens)[:, step]
        lm_lp = jax.nn.log_softmax(lm_logits, axis=-1)
        return am + lm_weight * lm_lp

    return fused
