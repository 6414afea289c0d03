"""Single typed configuration tree for the whole framework.

Replaces the reference's three coexisting config systems (hydra YAML for stage 1,
JSON AttrDict for the vocoder, env-var toggles everywhere — see
/root/reference/multi_target_lip2speech/conf/lrs3/multi_target.yaml,
/root/reference/multi_input_vocoder/configs/lrs3/multi_input.json,
/root/reference/config.py) with one dataclass hierarchy.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence


# ---------------------------------------------------------------------------
# Audio / video constants of the pipeline (reference config.py:20-30)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AudioConfig:
    """Audio and mel-spectrogram parameters.

    The stage-1 mel target and dataset mels use the Tacotron-style centered STFT
    (reference create_dataset.py:62-75); the vocoder training mel-loss uses the
    HiFi-GAN-style STFT with (n_fft-hop)/2 edge padding, center=False
    (reference speech-resynthesis/dataset.py:44-67).
    """

    sample_rate: int = 16_000
    # Dataset / stage-1 mel: 640/160/640, 80 bins, 0..8000 Hz  (100 Hz frame rate)
    n_fft: int = 640
    hop_length: int = 160
    win_length: int = 640
    num_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    # Vocoder mel-loss STFT (multi_input.json: n_fft 1024 / hop 256 / win 1024, fmax None)
    loss_n_fft: int = 1024
    loss_hop_length: int = 256
    loss_win_length: int = 1024
    loss_fmax: float | None = None


@dataclass(frozen=True)
class VideoConfig:
    fps: int = 25
    mouth_size: int = 88           # mouth-ROI crop fed to the model (88x88 grayscale)
    crop_size: int = 96            # aligned mouth frame size before train/test crop
    max_frames: int = 600          # max_sample_size (24 s at 25 fps)
    max_duration_s: float = 24.0


@dataclass(frozen=True)
class UnitConfig:
    """Discrete speech-unit vocabulary.

    200 HuBERT-base layer-6 KM clusters (reference datasets/lrs3/label/dict.unt.txt)
    plus fairseq-style specials.  Unit rate is 50 Hz = 2 units per video frame.
    Symbol layout follows the fairseq Dictionary: bos=0, pad=1, eos=2, unk=3,
    units at 4..203.
    """

    num_units: int = 200
    bos: int = 0
    pad: int = 1
    eos: int = 2
    unk: int = 3
    num_special: int = 4
    units_per_frame: int = 2       # 50 Hz units vs 25 fps video
    mel_per_frame: int = 4         # 100 Hz mel vs 25 fps video

    @property
    def vocab_size(self) -> int:
        return self.num_units + self.num_special  # 204

    def unit_to_token(self, unit: int) -> int:
        return unit + self.num_special

    def token_to_unit(self, token: int) -> int:
        return token - self.num_special


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ConformerConfig:
    """ESPnet-style conformer trunk (reference model.py:105-177)."""

    dim: int = 512
    ffn_dim: int = 2048
    heads: int = 8
    layers: int = 12
    dropout: float = 0.1
    attention_dropout: float = 0.1
    conv_kernel: int = 31
    macaron: bool = True
    layer_norm_first: bool = True          # normalize_before
    # RAVEn _espnet extensions (reference raven/_espnet encoder.py:53-330)
    layerscale: bool = False
    init_values: float = 0.1
    drop_path: float = 0.0
    remat: bool = False                    # jax.checkpoint each layer
    input_dim: int = 512                   # feature dim entering the embed Linear
    use_flash: bool = False                # Pallas rel-flash attention (O(T) mem;
                                           # 16% faster at 1200 tokens on v5e)


@dataclass(frozen=True)
class FrontendConfig:
    """Visual frontend selection.

    kind:
      "resnet3d"  — built-in Conv3d+ResNet-18 frontend (conformer-only variant,
                    reference espnet backbones/conv3d_extractor.py:25-101)
      "avhubert"  — AV-HuBERT large transformer (reference avhubert/hubert.py:317-745)
      "auto_avsr" — frozen Auto-AVSR conformer encoder (reference model_auto_avsr.py:28-140)
      "raven"     — frozen RAVEn transformer (reference model_raven.py:34-147)
    """

    kind: str = "resnet3d"
    relu_type: str = "swish"
    frozen: bool = False
    # avhubert / auto_avsr / raven encoder dims
    encoder_dim: int = 512
    encoder_heads: int = 8
    encoder_ffn_dim: int = 2048
    encoder_layers: int = 12


@dataclass(frozen=True)
class MultiTargetConfig:
    """Stage-1 multi-target lip2speech model (reference model.py:66-228)."""

    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    conformer: ConformerConfig = field(default_factory=ConformerConfig)
    units: UnitConfig = field(default_factory=UnitConfig)
    spk_emb_dim: int = 256
    mel_dim: int = 80
    final_dropout: float = 0.1
    text_supervision: bool = False
    text_vocab_size: int = 0


@dataclass(frozen=True)
class VocoderConfig:
    """Stage-2 multi-input HiFi-GAN (reference models_multi_input.py:26-97 +
    speech-resynthesis/models.py:16-229, configs/lrs3/multi_input.json)."""

    model_in_dim: int = 336                    # 80 mel + 128 code + 128 speaker
    num_embeddings: int = 200                  # unit vocabulary (no specials here)
    embedding_dim: int = 128
    embedder_dim: int = 256                    # speaker d-vector input dim
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (5, 4, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (11, 8, 4, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    segment_size: int = 8960
    code_hop_size: int = 320
    mel_hop_size: int = 160
    text_supervision: bool = False
    # serving optimization: reformulate the small-channel late stages as
    # output-time-folded matmuls with >=128 MXU lanes (ops/fold_conv.py).
    # Numerically exact; off by default to keep training graphs identical.
    mxu_fold: bool = False
    # keep the small-channel tail (ch <= 64) in a folded (T/F, F*C = 128)
    # layout: XLA pads thin minor dims to 128 lanes, so the unfolded tail
    # moves 8x/4x/2x the bytes in every op (NOTES r3 late profile). Exact.
    fold_tail: bool = True
    # fuse each stage's whole resblock trio into one Pallas kernel (VMEM-
    # resident; ops/pallas_fused_tail.py). Exact forward; gradients flow
    # through the XLA path via custom_vjp. Off by default (serving turns it
    # on — the pipeline sets it when running on TPU).
    fused_tail_kernel: bool = False

    @property
    def total_upsample(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out      # 160 per 100-Hz conditioning row = code_hop_size/2


# ---------------------------------------------------------------------------
# Training configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Stage1TrainConfig:
    """Stage-1 optimization (reference conf/lrs3/multi_target.yaml)."""

    lr: float = 1e-3
    adam_b1: float = 0.9
    adam_b2: float = 0.98
    adam_eps: float = 1e-8
    weight_decay: float = 0.01
    warmup_updates: int = 10_000
    max_updates: int = 150_000
    clip_norm: float = 10.0
    update_freq: int = 8                       # gradient accumulation
    label_smoothing: float = 0.1
    mel_weight: float = 10.0
    text_weight: float = 1.0
    sentence_avg: bool = True
    max_sample_size: int = 600
    batch_size: int = 8
    seed: int = 1337
    freeze_finetune_updates: int = 0
    # bf16 mixed-precision training (beyond-reference; yaml fp16:false):
    # forward/backward in bf16 with f32 master weights + f32 optimizer state
    # and f32 loss/grad accumulation — the TPU-natural mixed precision, no
    # loss scaling needed (bf16 shares the f32 exponent range)
    bf16_compute: bool = False


@dataclass(frozen=True)
class Stage2TrainConfig:
    """Stage-2 GAN optimization (reference multi_input_vocoder/train.py:38-309)."""

    lr: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999                    # ExponentialLR gamma per epoch
    batch_size: int = 16
    seed: int = 1234
    lambda_mel: float = 45.0
    lambda_fm: float = 2.0
    mel_aug: bool = False                      # Gaussian blur + noise on input mels


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes for pjit sharding."""

    data: int = -1          # -1: all remaining devices
    model: int = 1


@dataclass(frozen=True)
class DecodeConfig:
    """Unit decode (reference sequence_generator.py:20-507 semantics)."""

    beam: int = 1           # 1 = jitted argmax scan (equivalent after the
                            # no-decoder simplification); >1 keeps beam parity path
    max_len_a: float = 1.0
    max_len_b: int = 0


@dataclass(frozen=True)
class PipelineConfig:
    audio: AudioConfig = field(default_factory=AudioConfig)
    video: VideoConfig = field(default_factory=VideoConfig)
    model: MultiTargetConfig = field(default_factory=MultiTargetConfig)
    vocoder: VocoderConfig = field(default_factory=VocoderConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    stage1: Stage1TrainConfig = field(default_factory=Stage1TrainConfig)
    stage2: Stage2TrainConfig = field(default_factory=Stage2TrainConfig)


# ---------------------------------------------------------------------------
# (De)serialization helpers
# ---------------------------------------------------------------------------

def _replace_nested(cfg: Any, updates: dict[str, Any]) -> Any:
    kwargs: dict[str, Any] = {}
    for key, value in updates.items():
        current = getattr(cfg, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            kwargs[key] = _replace_nested(current, value)
        else:
            kwargs[key] = value
    return dataclasses.replace(cfg, **kwargs)


def with_overrides(cfg: Any, overrides: dict[str, Any]) -> Any:
    """Return a copy of a (possibly nested) dataclass config with updates applied.

    Keys may be nested dicts or dotted paths: {"model.conformer.dim": 256}.
    """
    nested: dict[str, Any] = {}
    for key, value in overrides.items():
        parts = key.split(".")
        node = nested
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return _replace_nested(cfg, nested)


def to_dict(cfg: Any) -> dict[str, Any]:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(to_dict(cfg), indent=2)


def preset(name: str) -> PipelineConfig:
    """Named model presets mirroring the reference's four stage-1 variants."""
    base = PipelineConfig()
    presets = {
        # reference model.py:66-228 (conformer w/ built-in resnet3d frontend)
        "multi_target": {},
        # tiny variant for smoke tests / CI (not a reference config)
        "tiny": {
            "model.conformer": ConformerConfig(dim=32, ffn_dim=64, heads=2,
                                               layers=1, input_dim=512),
            "vocoder": VocoderConfig(
                model_in_dim=80 + 2 * 8, embedding_dim=8,
                upsample_initial_channel=64,
                resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),)),
            "stage1": Stage1TrainConfig(update_freq=1, batch_size=2,
                                        warmup_updates=2, max_updates=4),
        },
        # reference model_avhubert.py:27-155 (frozen AV-HuBERT large frontend)
        "multi_target_avhubert": {
            "model.frontend": FrontendConfig(
                kind="avhubert", frozen=True,
                encoder_dim=1024, encoder_heads=16,
                encoder_ffn_dim=4096, encoder_layers=24,
            ),
            "model.conformer": ConformerConfig(input_dim=1024),
        },
        # reference model_auto_avsr.py:28-140 (frozen 12-block conformer frontend)
        "multi_target_auto_avsr": {
            "model.frontend": FrontendConfig(
                kind="auto_avsr", frozen=True,
                encoder_dim=768, encoder_heads=12,
                encoder_ffn_dim=3072, encoder_layers=12,
            ),
            "model.conformer": ConformerConfig(input_dim=768),
        },
        # reference model_raven.py:34-147 (frozen RAVEn transformer frontend)
        "multi_target_raven": {
            "model.frontend": FrontendConfig(
                kind="raven", frozen=True,
                encoder_dim=1024, encoder_heads=16,
                encoder_ffn_dim=4096, encoder_layers=24,
            ),
            "model.conformer": ConformerConfig(input_dim=1024),
        },
    }
    if name not in presets:
        raise ValueError(f"unknown preset {name!r}; available: {sorted(presets)}")
    return with_overrides(base, presets[name])
