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


def test_media_command_builders_cover_reference_templates():
    """Argv builders for every helpers.py:29-41 ffmpeg template."""
    from lip2speech_tpu.pipeline import media as m

    assert m.pad_audio_start_cmd("a.wav", "b.wav", 2)[-2] == "adelay=2000|2000"
    assert "apad=pad_dur=1.5" in m.pad_audio_end_cmd("a.wav", "b.wav", 1.5)
    assert "00:00:02.000" in m.remove_audio_pad_cmd("a.wav", "b.wav", 2)
    crop = m.crop_video_cmd("v.mp4", "o.mp4", 1.25, 3.5)
    assert crop[crop.index("-ss") + 1] == "00:00:01.250"
    assert crop[crop.index("-to") + 1] == "00:00:03.500"
    multi = m.crop_video_multiple_cmd("v.mp4", [(0, 1, "a.mp4"), (2, 3, "b.mp4")])
    assert multi.count("-ss") == 2 and multi[-1] == "b.mp4"
    sp = m.speed_cmd("v.mp4", "o.mp4", 2.0)
    fc = sp[sp.index("-filter_complex") + 1]
    assert "setpts=0.5*PTS" in fc and "atempo=2.0" in fc
    assert "loudnorm" in " ".join(m.normalize_audio_cmd("a.wav", "b.wav"))
    assert m._ffmpeg_time(3723.5) == "01:02:03.500"
    assert "gif" in m.INVALID_VIDEO_FORMATS


def test_media_probe_helpers_gate_cleanly(tmp_path):
    """Without ffprobe (or on junk input) the probes return None/{} instead
    of raising — the gateway treats that as 'cannot validate, proceed'."""
    from lip2speech_tpu.pipeline import media as m

    import shutil as _shutil

    if _shutil.which("ffprobe") is None:
        assert m.probe("nope.mp4") == {}
        assert m.get_fps("nope.mp4") is None
        assert m.is_valid_video_format("nope.mp4") is None
    else:
        import subprocess as _sp

        try:
            info = m.probe(__file__)   # a .py file is not a video
            assert isinstance(info, dict)
        except _sp.CalledProcessError:
            pass
