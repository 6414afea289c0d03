"""AV-HuBERT masked-prediction pretraining (audio-visual).

Rebuild of the pretraining path of reference avhubert/hubert.py:591-674 +
hubert_criterion.py:40-166 (the task that produces the published frontends):

  * input masking: masked video frames are replaced (zeros — the B==1 branch
    and 'same_seq' degenerate case; swap-from-other-sequence is a data aug we
    expose via pre-swapped inputs); masked AUDIO frames are replaced by the
    learned mask embedding (hubert.py:396 mask_emb, :625 `x[mask] = mask_emb`)
  * both modalities -> SubModel features; training-time modality dropout
    zeroes one whole modality per forward (hubert.py:611-617)
  * concat fuse -> LN -> proj -> transformer -> final_proj
  * logits = cosine(proj_x, label_embeddings) / logit_temp   (sim_type
    'cosine', hubert.py:576-589)
  * loss = CE over masked positions (+ optional unmasked CE + feature penalty)

TPU-native: positions are never gathered — CE is computed densely and
mask-weighted, identical in value and jit-friendly under static shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lip2speech_tpu.models.avhubert import (Wav2Vec2TransformerEncoder,
                                            fuse_modality_features)
from lip2speech_tpu.models.layers import LayerNorm, Linear
from lip2speech_tpu.models.resnet3d import ResNet3DFrontend


class AVHubertPretrainModel(nn.Module):
    dim: int = 1024
    heads: int = 16
    ffn_dim: int = 4096
    layers: int = 24
    final_dim: int = 256
    num_classes: int = 500          # k-means cluster vocabulary
    logit_temp: float = 0.1
    dropout: float = 0.1
    layer_norm_first: bool = True
    audio_feat_dim: int = 0          # >0 enables the audio modality (104)
    modality_dropout: float = 0.0    # hubert.py:255
    audio_dropout: float = 0.0       # hubert.py:256

    @nn.compact
    def __call__(self, video, frames_mask, span_mask, train: bool = False,
                 audio=None):
        """video: (B, T, H, W, 1) with masked frames already zeroed (or None
        for audio-only); audio: (B, T, F) RAW stacked-logfbank features —
        masked audio frames are replaced in here by the learned mask
        embedding (hubert.py:396, :625); frames_mask: (B, T) True=valid;
        span_mask: (B, T) True=masked.

        Returns dict(logits (B, T, V), span_mask, frames_mask, features_pen).
        """
        feats_v = feats_a = None
        if video is not None:
            feats_v = ResNet3DFrontend(relu_type="prelu", name="resnet")(video, train)
            feats_v = Linear(self.dim, name="video_proj")(feats_v)
        if self.audio_feat_dim > 0:
            # learned audio mask embedding (hubert.py:396 uniform init)
            mask_emb = self.param("mask_emb", nn.initializers.uniform(1.0),
                                  (self.audio_feat_dim,))
            audio_proj = Linear(self.dim, name="audio_proj")
            if audio is not None:
                audio = jnp.where(span_mask[:, :, None], mask_emb, audio)
                feats_a = audio_proj(audio)
            else:
                # params must exist regardless of the init-time modalities —
                # otherwise a video-only init can never serve audio later
                audio_proj(jnp.zeros((1, 1, self.audio_feat_dim),
                                     feats_v.dtype))
        feats_a, feats_v = fuse_modality_features(
            self, feats_a, feats_v, modality_dropout=self.modality_dropout,
            audio_dropout=self.audio_dropout, train=train)
        fused = jnp.concatenate([feats_a, feats_v], axis=-1)
        features_pen = jnp.mean(jnp.square(fused))
        fused = LayerNorm(2 * self.dim, eps=1e-5, name="fuse_layer_norm")(fused)
        x = Linear(self.dim, name="post_extract_proj")(fused)
        x = nn.Dropout(self.dropout, name="dropout_input")(x, deterministic=not train)
        x = Wav2Vec2TransformerEncoder(
            dim=self.dim, heads=self.heads, ffn_dim=self.ffn_dim,
            layers=self.layers, dropout=self.dropout,
            layer_norm_first=self.layer_norm_first, name="encoder")(
            x, frames_mask, train)

        proj = Linear(self.final_dim, name="final_proj")(x)      # (B, T, F)
        label_embs = self.param(
            "label_embs", nn.initializers.uniform(1.0),
            (self.num_classes, self.final_dim))
        # cosine similarity / temperature (hubert.py:576-589)
        pn = proj / jnp.maximum(
            jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-6)
        en = label_embs / jnp.maximum(
            jnp.linalg.norm(label_embs, axis=-1, keepdims=True), 1e-6)
        logits = (pn @ en.T) / self.logit_temp
        return {"logits": logits, "span_mask": span_mask,
                "frames_mask": frames_mask, "features_pen": features_pen}


def pretrain_loss(outputs: dict, targets: jnp.ndarray,
                  pred_masked_weight: float = 1.0,
                  pred_nomask_weight: float = 0.0,
                  feature_pen_weight: float = 10.0):
    """AVHubertCriterion: sum-reduced CE over masked (and optionally
    unmasked) positions + feature penalty. Returns (loss, logs)."""
    logits = outputs["logits"]
    lprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lprobs, targets[..., None], axis=-1)[..., 0]

    valid = outputs["frames_mask"]
    masked = outputs["span_mask"] & valid
    unmasked = (~outputs["span_mask"]) & valid

    loss_m = jnp.sum(jnp.where(masked, nll, 0.0))
    loss_u = jnp.sum(jnp.where(unmasked, nll, 0.0))
    loss = (pred_masked_weight * loss_m + pred_nomask_weight * loss_u
            + feature_pen_weight * outputs["features_pen"])

    correct_m = jnp.sum((jnp.argmax(logits, -1) == targets) & masked)
    logs = {"loss_m": loss_m, "loss_u": loss_u,
            "n_masked": jnp.sum(masked), "n_correct_m": correct_m,
            "features_pen": outputs["features_pen"]}
    return loss, logs


def mask_video_frames(video: jnp.ndarray, span_mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out masked frames (hubert.py:465-466 input-masking semantics)."""
    return jnp.where(span_mask[:, :, None, None, None], 0.0, video)
