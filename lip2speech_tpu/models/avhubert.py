"""AV-HuBERT audio-visual encoder — the frozen frontend of the best variant.

Rebuild of the `extract_finetune` path of reference avhubert/hubert.py:317-745
for all three modality combinations (video-only, audio-only, audio+video):

  video: ResEncoder (prelu)               hubert.py:350 / resnet.py:131-169
         -> SubModel.proj Linear(512->D)  hubert.py:317-332
  audio: SubModel.proj Linear(F->D)       hubert.py:351 (resnet=None; F =
         26 logfbank x 4-stack = 104, hubert_dataset.py:278-293 stacker)
  absent modality contributes zeros       hubert.py:703-711
  -> concat([audio, video], C)            hubert.py:713-716 (audio first!)
  -> LayerNorm(2D)                        hubert.py:718 (eps 1e-5, fairseq)
  -> post_extract_proj Linear(2D -> D)    hubert.py:727
  -> wav2vec2 TransformerEncoder          (conv-pos-emb k128 g16, pre/post-norm)

Training-time modality dropout (hubert.py:611-617): ONE scalar draw per
forward — with prob `modality_dropout` zero a whole modality: audio with
prob `audio_dropout`, else video.

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


def fuse_modality_features(module: nn.Module, feats_a, feats_v, *,
                           modality_dropout: float, audio_dropout: float,
                           train: bool):
    """Shared modality fuse prep (used by the encoder AND the pretrain model):
    the absent modality contributes zeros (hubert.py:703-711), and with both
    present under train, ONE uniform draw per forward decides whether to drop
    audio or video (hubert.py:611-617). Returns (feats_a, feats_v)."""
    both = feats_a is not None and feats_v is not None
    if feats_v is None:
        feats_v = jnp.zeros_like(feats_a)
    if feats_a is None:
        feats_a = jnp.zeros_like(feats_v)
    if train and modality_dropout > 0.0 and both:
        rng = module.make_rng("dropout")
        r_mod, r_aud = jax.random.uniform(rng, (2,))
        drop_audio = (r_mod < modality_dropout) & (r_aud < audio_dropout)
        drop_video = (r_mod < modality_dropout) & ~(r_aud < audio_dropout)
        feats_a = jnp.where(drop_audio, 0.0, feats_a)
        feats_v = jnp.where(drop_video, 0.0, feats_v)
    return feats_a, feats_v


class AVHubertEncoder(nn.Module):
    """AV-HuBERT encoder. video: (B, T, H, W, 1) or None; audio: (B, T, F)
    stacked-logfbank features or None -> (B, T, dim).

    `audio_feat_dim == 0` (the lip2speech serving default) builds a
    video-only module with NO audio parameters — existing video checkpoints
    load unchanged. With `audio_feat_dim > 0` the audio SubModel.proj exists
    and either modality (or both) may be passed; an absent one contributes
    zeros into the fuse, exactly hubert.py:703-711."""

    dim: int = 1024
    heads: int = 16
    ffn_dim: int = 4096
    layers: int = 24
    dropout: float = 0.1
    layer_norm_first: bool = True
    audio_feat_dim: int = 0          # 26 logfbank x 4 stack = 104 when audio on
    modality_dropout: float = 0.0    # hubert.py:255 cfg.modality_dropout
    audio_dropout: float = 0.0       # hubert.py:256 cfg.audio_dropout

    @nn.compact
    def __call__(self, video=None, frames_mask=None, train: bool = False,
                 audio=None):
        if video is None and audio is None:
            raise ValueError("need at least one modality")
        if audio is not None and self.audio_feat_dim == 0:
            raise ValueError("audio passed to a video-only encoder "
                             "(set audio_feat_dim)")
        feats_v = feats_a = None
        if video is not None:
            feats_v = ResNet3DFrontend(relu_type="prelu", name="resnet")(video, train)
            feats_v = Linear(self.dim, name="video_proj")(feats_v)
        if self.audio_feat_dim > 0:
            # audio SubModel: Linear only (resnet=None, sub_encoder_layers=0)
            audio_proj = Linear(self.dim, name="audio_proj")
            if audio is not None:
                feats_a = audio_proj(audio)
            else:
                # the params must exist regardless of which modalities were
                # fed at init (an absent modality contributes zeros at FUSE
                # level, not proj(zeros)); throwaway 1x1 call, DCE'd in apply
                audio_proj(jnp.zeros((1, 1, self.audio_feat_dim),
                                     feats_v.dtype))
        feats_a, feats_v = fuse_modality_features(
            self, feats_a, feats_v, modality_dropout=self.modality_dropout,
            audio_dropout=self.audio_dropout, train=train)
        # modality fuse: concat([audio, video], channel) -> LN -> proj
        fused = jnp.concatenate([feats_a, feats_v], axis=-1)
        fused = LayerNorm(2 * self.dim, eps=1e-5, name="fuse_layer_norm")(fused)
        x = Linear(self.dim, name="post_extract_proj")(fused)
        x = nn.Dropout(self.dropout, name="dropout_input")(x, deterministic=not train)
        return Wav2Vec2TransformerEncoder(
            dim=self.dim, heads=self.heads, ffn_dim=self.ffn_dim, layers=self.layers,
            dropout=self.dropout, layer_norm_first=self.layer_norm_first,
            name="encoder")(x, frames_mask, train)


# the lip2speech stage-1 frontend is the video-only configuration
AVHubertVideoEncoder = AVHubertEncoder
