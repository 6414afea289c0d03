"""Spectral-gating denoiser + media helper tests."""

import numpy as np

from lip2speech_tpu.ops.denoise import preprocess_audio, spectral_gate
from lip2speech_tpu.pipeline.media import (
    extract_audio_cmd,
    get_updated_dims,
    resize_cmd,
)


def _snr(clean, sig):
    noise = sig - clean
    return 10 * np.log10(np.sum(clean**2) / max(np.sum(noise**2), 1e-12))


def test_spectral_gate_improves_snr():
    rng = np.random.default_rng(0)
    t = np.arange(32000) / 16000
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.0 * t))
    clean = (env * np.sin(2 * np.pi * 440 * t)).astype(np.float32) * 0.5
    noisy = clean + rng.normal(0, 0.05, len(clean)).astype(np.float32)

    den = np.asarray(spectral_gate(noisy, strength=2.5))
    assert den.shape == noisy.shape
    assert _snr(clean, den) > _snr(clean, noisy) + 2.0  # >=2 dB improvement


def test_spectral_gate_roundtrip_on_clean():
    """A clean MODULATED signal passes nearly unchanged: the noise floor is
    estimated from its quiet frames, so active frames gate ~1. (A constant
    tone IS the floor by definition and would be gated — correct behavior.)"""
    t = np.arange(32000) / 16000
    env = (np.sin(2 * np.pi * 1.5 * t) > 0).astype(np.float32)  # on/off bursts
    clean = (env * 0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    out = np.asarray(spectral_gate(clean, strength=1.0))
    corr = clean @ out / (np.linalg.norm(clean) * np.linalg.norm(out) + 1e-9)
    assert corr > 0.95


def test_preprocess_audio_normalizes():
    rng = np.random.default_rng(1)
    wav = rng.normal(0, 0.01, 8000).astype(np.float32)
    out = preprocess_audio(wav)
    assert abs(np.abs(out).max() - 0.95) < 1e-3


def test_get_updated_dims():
    assert get_updated_dims(480, 360) == (480, 360)
    assert get_updated_dims(1920, 1080) == (480, 270)
    assert get_updated_dims(1080, 1920) == (202, 360)
    # even-dim enforcement
    w, h = get_updated_dims(1001, 333)
    assert w % 2 == 0 and h % 2 == 0


def test_command_builders():
    cmd = resize_cmd("a.mp4", "b.mp4", 480, 360)
    assert cmd[0] == "ffmpeg" and "scale=480:360" in cmd
    cmd = extract_audio_cmd("a.mp4", "a.wav")
    assert "-ar" in cmd and "16000" in cmd
