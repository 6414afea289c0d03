"""AV-HuBERT visual encoder — the frozen frontend of the best-scoring variant.

Rebuild of the video-only `extract_finetune` path of reference
avhubert/hubert.py:317-745 (modalities=["video"], so the audio branch
contributes zeros into the concat fuse):

  ResEncoder (prelu)                      hubert.py:350 / resnet.py:131-169
  -> SubModel.proj Linear(512 -> D)       hubert.py:317-332
  -> concat([zeros_audio, video], C)      hubert.py:713-716 (audio first!)
  -> LayerNorm(2D)                        hubert.py:718 (eps 1e-5, fairseq)
  -> post_extract_proj Linear(2D -> D)    hubert.py:727
  -> wav2vec2 TransformerEncoder          (conv-pos-emb k128 g16, pre/post-norm)

The wav2vec2 transformer uses absolute conv positional embeddings and plain
softmax attention — no relative positions.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.models.layers import Conv1d, Linear, LayerNorm
from lip2speech_tpu.models.resnet3d import ResNet3DFrontend
from lip2speech_tpu.ops import nn as ops


class SelfAttention(nn.Module):
    """fairseq MultiheadAttention (self-attention, batch-first rebuild)."""

    dim: int
    heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        b, t, d = x.shape
        h, dk = self.heads, d // self.heads
        q = Linear(d, name="q_proj")(x).reshape(b, t, h, dk)
        k = Linear(d, name="k_proj")(x).reshape(b, t, h, dk)
        v = Linear(d, name="v_proj")(x).reshape(b, t, h, dk)
        if deterministic or self.dropout == 0.0:
            # flash-attention Pallas kernel on TPU (no attn-dropout path);
            # jnp oracle elsewhere
            from lip2speech_tpu.ops.pallas_attention import attention

            key_mask = mask if mask is not None else jnp.ones((b, t), bool)
            out = attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                            v.transpose(0, 2, 1, 3), key_mask)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / float(np.sqrt(dk))
            if mask is not None:
                scores = jnp.where(mask[:, None, None, :], scores, -1e9)
            attn = jax.nn.softmax(scores, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        return Linear(d, name="out_proj")(out)


class TransformerLayer(nn.Module):
    """fairseq TransformerSentenceEncoderLayer (GELU, pre- or post-norm)."""

    dim: int
    heads: int
    ffn_dim: int
    dropout: float = 0.1
    layer_norm_first: bool = True

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        drop = nn.Dropout(self.dropout)
        if self.layer_norm_first:
            y = LayerNorm(self.dim, eps=1e-5, name="self_attn_layer_norm")(x)
            y = SelfAttention(self.dim, self.heads, self.dropout, name="self_attn")(y, mask, deterministic)
            x = x + drop(y, deterministic=deterministic)
            y = LayerNorm(self.dim, eps=1e-5, name="final_layer_norm")(x)
            y = Linear(self.ffn_dim, name="fc1")(y)
            y = ops.gelu(y)
            y = Linear(self.dim, name="fc2")(y)
            x = x + drop(y, deterministic=deterministic)
        else:
            y = SelfAttention(self.dim, self.heads, self.dropout, name="self_attn")(x, mask, deterministic)
            x = LayerNorm(self.dim, eps=1e-5, name="self_attn_layer_norm")(x + drop(y, deterministic=deterministic))
            y = Linear(self.ffn_dim, name="fc1")(x)
            y = ops.gelu(y)
            y = Linear(self.dim, name="fc2")(y)
            x = LayerNorm(self.dim, eps=1e-5, name="final_layer_norm")(x + drop(y, deterministic=deterministic))
        return x


class ConvPositionalEmbedding(nn.Module):
    """wav2vec2 conv positional embedding: Conv1d(k=128, groups=16) + SamePad + GELU.

    The torch original wraps the conv in weight_norm; the converter folds it.
    """

    dim: int
    kernel: int = 128
    groups: int = 16

    @nn.compact
    def __call__(self, x):
        y = Conv1d(self.dim, self.kernel, padding=self.kernel // 2,
                   groups=self.groups, name="conv")(x)
        if self.kernel % 2 == 0:  # SamePad: drop trailing element for even kernels
            y = y[:, :-1]
        return ops.gelu(y)


class Wav2Vec2TransformerEncoder(nn.Module):
    """fairseq wav2vec2 TransformerEncoder (the AV-HuBERT trunk)."""

    dim: int = 1024
    heads: int = 16
    ffn_dim: int = 4096
    layers: int = 24
    dropout: float = 0.1
    layer_norm_first: bool = True

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        det = not train
        if mask is not None:  # fairseq zeroes padded positions before pos-conv
            x = jnp.where(mask[:, :, None], x, 0.0)
        x = x + ConvPositionalEmbedding(self.dim, name="pos_conv")(x)
        if not self.layer_norm_first:
            x = LayerNorm(self.dim, eps=1e-5, name="layer_norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=det)
        for i in range(self.layers):
            x = TransformerLayer(self.dim, self.heads, self.ffn_dim, self.dropout,
                                 self.layer_norm_first, name=f"layers_{i}")(x, mask, det)
        if self.layer_norm_first:
            x = LayerNorm(self.dim, eps=1e-5, name="layer_norm")(x)
        return x


class AVHubertVideoEncoder(nn.Module):
    """(B, T, H, W, 1) video -> (B, T, dim) AV-HuBERT features (video-only)."""

    dim: int = 1024
    heads: int = 16
    ffn_dim: int = 4096
    layers: int = 24
    dropout: float = 0.1
    layer_norm_first: bool = True

    @nn.compact
    def __call__(self, video, frames_mask=None, train: bool = False):
        feats = ResNet3DFrontend(relu_type="prelu", name="resnet")(video, train)
        feats = Linear(self.dim, name="video_proj")(feats)
        # modality fuse: concat([audio=0, video], channel) -> LN -> proj
        fused = jnp.concatenate([jnp.zeros_like(feats), feats], axis=-1)
        fused = LayerNorm(2 * self.dim, eps=1e-5, name="fuse_layer_norm")(fused)
        x = Linear(self.dim, name="post_extract_proj")(fused)
        x = nn.Dropout(self.dropout, name="dropout_input")(x, deterministic=not train)
        return Wav2Vec2TransformerEncoder(
            dim=self.dim, heads=self.heads, ffn_dim=self.ffn_dim, layers=self.layers,
            dropout=self.dropout, layer_norm_first=self.layer_norm_first,
            name="encoder")(x, frames_mask, train)
