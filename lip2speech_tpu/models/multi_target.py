"""Stage-1 multi-target lip2speech model: video -> unit logits + mel.

Rebuild of reference multi_target_lip2speech/model*.py:
  * model.py:105-228        — conformer-only variant ("multi_target")
  * model_avhubert.py:27-155 — frozen AV-HuBERT frontend variant
  * model_auto_avsr.py:28-140 — frozen Auto-AVSR conformer frontend
  * model_raven.py:34-147   — frozen RAVEn transformer frontend

All variants share one skeleton: frontend features (25 Hz) are 2x
time-interleaved to 50 Hz, projected into a 12-layer macaron conformer, then:
  unit head: dropout -> 3-layer GELU MLP -> vocab logits        (50 Hz)
  mel head : concat(spk_emb, x) -> 3x [conv1d k3 + GELU] -> Linear(d,160)
             -> unfold 160 = 2x80 interleaved in time            (100 Hz)

Static shapes: T is the padded frame bucket; `frames_mask` (B, T) carries
validity and is interleaved alongside the features.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lip2speech_tpu.core.config import MultiTargetConfig
from lip2speech_tpu.models.conformer import ConformerEncoder
from lip2speech_tpu.models.layers import (
    Conv1d,
    Linear,
    kaiming_normal_fan_out_init,
)
from lip2speech_tpu.models.resnet3d import ResNet3DFrontend
from lip2speech_tpu.ops import nn as ops


def interleave_time(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """repeat_interleave along the time axis: (B, T, ...) -> (B, factor*T, ...).

    Matches torch.repeat_interleave(x, factor, dim=1)
    (reference model.py:190, model_avhubert.py:147-148).
    """
    reps = [1] * (x.ndim + 1)
    reps[2] = factor
    tiled = jnp.tile(x[:, :, None], reps)
    return tiled.reshape(x.shape[0], x.shape[1] * factor, *x.shape[2:])


class MLPHead(nn.Module):
    """3-layer GELU MLP unit head (reference model.py:253-304: MLP with
    kaiming_normal fan_out init, dims [d, d, vocab])."""

    dim: int
    out_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(2):
            x = Linear(self.dim, kernel_init=kaiming_normal_fan_out_init(self.dim),
                       name=f"fc{i}")(x)
            x = ops.gelu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return Linear(self.out_dim, kernel_init=kaiming_normal_fan_out_init(self.out_dim),
                      name="last")(x)


class MelHead(nn.Module):
    """Speaker-conditioned mel head (reference model.py:166-177,203-212)."""

    dim: int
    dropout: float = 0.1
    mel_dim: int = 80

    @nn.compact
    def __call__(self, x, spk_emb, deterministic: bool = True):
        """x: (B, T, D) at 50 Hz; spk_emb: (B, 256) -> (B, 2T, 80) at 100 Hz."""
        b, t, _ = x.shape
        spk = jnp.broadcast_to(spk_emb[:, None, :], (b, t, spk_emb.shape[-1]))
        y = jnp.concatenate([spk, x], axis=-1)
        for i in range(3):
            y = Conv1d(self.dim, 3, padding=1, name=f"conv{i}")(y)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            y = ops.gelu(y)
        y = Linear(2 * self.mel_dim, name="proj")(y)           # (B, T, 160)
        # 160 -> two 80-bin frames interleaved in time; torch semantics are
        # reshape(B,T,80,2).transpose(-1,-2).reshape(B,2T,80), i.e. frame j of
        # step t reads channels [c*2+j] (reference model.py:209-212)
        y = y.reshape(b, t, self.mel_dim, 2).transpose(0, 1, 3, 2)
        return y.reshape(b, 2 * t, self.mel_dim)


class MultiTargetModel(nn.Module):
    """Shared skeleton with pluggable frontend."""

    cfg: MultiTargetConfig

    def setup(self):
        fe = self.cfg.frontend
        cf = self.cfg.conformer
        if fe.kind == "resnet3d":
            self.frontend = ResNet3DFrontend(relu_type=fe.relu_type)
        elif fe.kind == "avhubert":
            from lip2speech_tpu.models.avhubert import AVHubertVideoEncoder

            self.frontend = AVHubertVideoEncoder(
                dim=fe.encoder_dim, heads=fe.encoder_heads,
                ffn_dim=fe.encoder_ffn_dim, layers=fe.encoder_layers)
        elif fe.kind == "auto_avsr":
            # frozen conformer encoder w/ its own resnet3d frontend
            # (reference model_auto_avsr.py:57-104: Encoder(768, 12 blocks) incl. frontend)
            self.frontend_resnet = ResNet3DFrontend(relu_type="swish")
            self.frontend_encoder = ConformerEncoder(
                dim=fe.encoder_dim, heads=fe.encoder_heads, ffn_dim=fe.encoder_ffn_dim,
                layers=fe.encoder_layers, macaron=True, use_conv=True)
        elif fe.kind == "raven":
            # RAVEn: resnet3d frontend + rel-MHA transformer (no macaron/conv)
            # with layerscale, drop-path 0.1, and BatchNorm FFN pre-norms
            # (model_raven.py:107-132: ff_bn_pre=True, post_norm=False)
            self.frontend_resnet = ResNet3DFrontend(relu_type="swish")
            self.frontend_encoder = ConformerEncoder(
                dim=fe.encoder_dim, heads=fe.encoder_heads, ffn_dim=fe.encoder_ffn_dim,
                layers=fe.encoder_layers, macaron=False, use_conv=False,
                layerscale=True, drop_path=0.1, ff_bn_pre=True)
        else:
            raise ValueError(f"unknown frontend {fe.kind!r}")

        # NOTE: the reference stacks proj_in (frontend_dim -> 512) and the
        # ESPnet embed Linear (512 -> d) with no nonlinearity between
        # (model_avhubert.py:216-219 + encoder.py embed); our ConformerEncoder
        # embed maps frontend_dim -> d directly and the converter folds the
        # two torch matrices into one.
        self.conformer = ConformerEncoder(
            dim=cf.dim, ffn_dim=cf.ffn_dim, heads=cf.heads, layers=cf.layers,
            dropout=cf.dropout, attention_dropout=cf.attention_dropout,
            positional_dropout=cf.dropout, conv_kernel=cf.conv_kernel,
            macaron=cf.macaron, normalize_before=cf.layer_norm_first,
            use_flash=cf.use_flash, remat=cf.remat)

        self.final_dropout = nn.Dropout(self.cfg.final_dropout)
        self.unit_head = MLPHead(cf.dim, self.cfg.units.vocab_size, self.cfg.final_dropout)
        self.mel_head = MelHead(cf.dim, self.cfg.final_dropout, self.cfg.mel_dim)
        if self.cfg.text_supervision and self.cfg.text_vocab_size:
            self.text_head = Linear(self.cfg.text_vocab_size)
        else:
            self.text_head = None

    def extract_frontend(self, video, frames_mask, train: bool = False):
        """(B, T, H, W, 1) -> (B, T, F) 25 Hz frontend features."""
        fe = self.cfg.frontend
        # frozen frontends run in eval mode (BN running stats, no dropout),
        # matching the reference's freeze_finetune_updates = max_updates setup
        fe_train = train and not fe.frozen
        if fe.kind == "resnet3d":
            return self.frontend(video, train=fe_train)
        if fe.kind == "avhubert":
            return self.frontend(video, frames_mask, train=fe_train)
        # auto_avsr / raven: resnet + their own encoder
        feats = self.frontend_resnet(video, train=fe_train)
        feats, _ = self.frontend_encoder(feats, frames_mask, train=fe_train)
        return feats

    def __call__(self, video, frames_mask, spk_emb, train: bool = False):
        """video: (B, T, H, W, 1); frames_mask: (B, T) True=valid; spk_emb: (B, 256).

        Returns dict:
          unit_logits: (B, 2T, vocab)   50 Hz
          mel:         (B, 4T, 80)      100 Hz  (2x from conformer rate)
          mask:        (B, 2T)          True=valid at unit rate
        """
        feats = self.extract_frontend(video, frames_mask, train)
        if self.cfg.frontend.frozen:
            feats = jax.lax.stop_gradient(feats)

        # 25 Hz -> 50 Hz
        x = interleave_time(feats, self.cfg.units.units_per_frame)
        mask = interleave_time(frames_mask, self.cfg.units.units_per_frame)

        x, _ = self.conformer(x, mask, train=train)

        mel = self.mel_head(x, spk_emb, deterministic=not train)   # (B, 4T, 80)

        y = self.final_dropout(x, deterministic=not train)
        unit_logits = self.unit_head(y, deterministic=not train)

        out = {"unit_logits": unit_logits, "mel": mel, "mask": mask}
        if self.text_head is not None:
            out["text_logits"] = self.text_head(y)
        return out
