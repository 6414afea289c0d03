"""In-process media ops (reference helpers.py:26-416 ran everything through
the ffmpeg binary; this image has no binary, so audio extraction goes
through the native libav shim and video transforms through cv2 —
pipeline/media.py round-5 tier)."""

import numpy as np
import pytest

from lip2speech_tpu import native
from lip2speech_tpu.pipeline import media
from lip2speech_tpu.utils.audio_io import read_wav, write_wav

EXAMPLE = "/root/reference/datasets/example.mp4"


def _shim():
    if native._lib("media_demux", native._cfg_media_demux) is None:
        pytest.skip("no compiler/libav for the media shim")


def _make_mp4(path, n=20, fps=25, w=64, h=48):
    cv2 = pytest.importorskip("cv2")
    if not hasattr(cv2, "VideoWriter"):
        pytest.skip("cv2 without videoio")
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        pytest.skip("cv2 mp4v encoder unavailable")
    for i in range(n):
        frame = np.full((h, w, 3), i * 10 % 256, np.uint8)
        writer.write(frame)
    writer.release()
    return path


def _frame_values(path):
    import cv2

    cap = cv2.VideoCapture(str(path))
    vals = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        vals.append(int(np.median(f)))
    cap.release()
    return vals


def test_extract_audio_real_video():
    """example.mp4 carries a real 16 kHz speech track; the shim must decode
    ~duration seconds of non-silent mono float32 (the reference's
    `ffmpeg -vn -ac 1 -ar 16000` subprocess, EXTRACT_AUDIO_COMMAND)."""
    _shim()
    audio = media.extract_audio(EXAMPLE, sr=16_000)
    assert audio is not None and audio.dtype == np.float32
    assert 4.5 <= len(audio) / 16_000 <= 6.0      # clip is ~5.2 s
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() > 0.05             # actual speech, not silence
    # resample honesty: decoding at half the rate halves the samples
    half = native.decode_audio(EXAMPLE, 8_000)
    assert abs(len(half) * 2 - len(audio)) < 64


def test_extract_audio_writes_wav(tmp_path):
    _shim()
    dst = tmp_path / "out.wav"
    audio = media.extract_audio(EXAMPLE, dst, sr=16_000)
    back, sr = read_wav(dst)
    assert sr == 16_000
    np.testing.assert_allclose(back, audio, atol=1.0 / 32_000)


def test_probe_audio_stream(tmp_path):
    _shim()
    assert native.probe_audio_sample_rate(EXAMPLE) == 16_000
    assert media.has_audio_stream(EXAMPLE) is True
    silent = _make_mp4(tmp_path / "silent.mp4")
    assert media.has_audio_stream(silent) is False
    with pytest.raises(ValueError):
        media.extract_audio(silent)


def test_video_props(tmp_path):
    p = _make_mp4(tmp_path / "v.mp4", n=20, fps=25, w=64, h=48)
    props = media.video_props(p)
    assert props["frame_count"] == 20
    assert props["width"] == 64 and props["height"] == 48
    assert abs(props["fps"] - 25) < 0.5
    assert abs(props["duration_s"] - 0.8) < 0.05


def test_resize_video(tmp_path):
    p = _make_mp4(tmp_path / "v.mp4")
    dst = tmp_path / "small.mp4"
    assert media.resize_video(p, dst, 32, 24)
    props = media.video_props(dst)
    assert (props["width"], props["height"]) == (32, 24)
    assert props["frame_count"] == 20


def test_change_fps(tmp_path):
    p = _make_mp4(tmp_path / "v.mp4", n=20, fps=50)
    dst = tmp_path / "cfr25.mp4"
    assert media.change_fps(p, dst, 25)
    props = media.video_props(dst)
    assert abs(props["fps"] - 25) < 0.5
    assert props["frame_count"] == 10
    # every output frame must be one of the even source frames
    vals = _frame_values(dst)
    assert all(abs(v - round(v / 20) * 20) <= 6 for v in vals)


def test_crop_video_segment(tmp_path):
    p = _make_mp4(tmp_path / "v.mp4", n=25, fps=25)
    dst = tmp_path / "seg.mp4"
    assert media.crop_video(p, dst, 0.2, 0.6)      # frames 5..14
    vals = _frame_values(dst)
    assert len(vals) == 10
    assert abs(vals[0] - 50) <= 6 and abs(vals[-1] - 140) <= 6


def test_concat_videos(tmp_path):
    a = _make_mp4(tmp_path / "a.mp4", n=5)
    b = _make_mp4(tmp_path / "b.mp4", n=7)
    dst = tmp_path / "joined.mp4"
    assert media.concat_videos([a, b], dst)
    assert media.video_props(dst)["frame_count"] == 12


def test_raw_video_ingestion_without_audio_sidecar(tmp_path):
    """Full dataset ingestion from ONE raw real-face mp4, no wav sidecar and
    no ffmpeg binary: cascade landmarks -> mouth crop -> in-process audio
    track extraction -> mel -> manifests (the reference needs dlib + ffmpeg
    + RTVC servers for this path)."""
    _shim()
    from lip2speech_tpu.cli.create_dataset import init_sample

    utt = init_sample(EXAMPLE, None, tmp_path, "test/clip/00000",
                      auto_landmarks=True)
    assert utt.n_frames == 132
    assert 4.5 * 16_000 <= utt.n_samples <= 6.0 * 16_000
    wav, sr = read_wav(tmp_path / "audio/test/clip/00000.wav")
    assert sr == 16_000 and np.abs(wav).max() > 0.05
    mel = np.load(tmp_path / "mel/test/clip/00000.npy")
    assert mel.shape[1] == 80 and np.isfinite(mel).all()
    vid = np.load(tmp_path / "video/test/clip/00000.npy")
    assert vid.shape == (132, 96, 96) and vid.dtype == np.uint8


def test_mux_overlay_roundtrip(tmp_path):
    """In-process listening-copy mux (reference overlay.py's
    `-map 0:v -map 1:a -c:v copy -shortest`): video packets stream-copied,
    audio replaced by the given PCM, audio clipped at the video's end."""
    _shim()
    sr = 16_000
    t = np.arange(int(8.0 * sr)) / sr          # LONGER than the 5.28 s video
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out = tmp_path / "overlaid.mp4"
    assert native.mux_overlay(EXAMPLE, tone, sr, out)

    back = native.decode_audio(out, sr)
    assert 5.0 <= len(back) / sr <= 5.6        # -shortest: video is 5.28 s
    spec = np.abs(np.fft.rfft(back[: sr * 4]))
    assert abs(np.argmax(spec) / 4 - 440.0) < 2.0
    props = media.video_props(out)
    assert props["frame_count"] == 132         # stream copy: frames intact
    assert (props["width"], props["height"]) == (224, 224)


def test_overlay_cli_end_to_end(tmp_path):
    """cli/overlay.py muxes through the native shim when ffmpeg is absent."""
    _shim()
    import json
    import subprocess
    import sys

    vdir = tmp_path / "videos"
    wdir = tmp_path / "wavs"
    odir = tmp_path / "out"
    vdir.mkdir()
    wdir.mkdir()
    import shutil

    shutil.copyfile(EXAMPLE, vdir / "clip.mp4")
    sr = 16_000
    write_wav(wdir / "clip.wav",
              (0.2 * np.random.default_rng(0).standard_normal(3 * sr)
               ).astype(np.float32), sr)
    proc = subprocess.run(
        [sys.executable, "-m", "lip2speech_tpu.cli.overlay",
         "--video-dir", str(vdir), "--pred-wav-dir", str(wdir),
         "--out-dir", str(odir)],
        capture_output=True, text=True, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-500:]
    status = json.loads(proc.stdout.strip().splitlines()[-1])
    assert status["pairs"] == 1 and status["muxed"] == 1
    out = odir / "clip_overlay.mp4"
    assert media.video_props(out)["frame_count"] == 132
    assert native.probe_audio_sample_rate(out) == sr


def test_audio_pad_ops(tmp_path):
    sr = 16_000
    audio = np.sin(np.linspace(0, 100, sr)).astype(np.float32) * 0.5
    src = tmp_path / "a.wav"
    write_wav(src, audio, sr)

    padded = tmp_path / "pad.wav"
    media.pad_audio_start(src, padded, 0.5)
    out, _ = read_wav(padded)
    assert len(out) == sr + sr // 2
    assert np.abs(out[: sr // 2]).max() == 0

    media.pad_audio_end(src, padded, 0.25)
    out, _ = read_wav(padded)
    assert len(out) == sr + sr // 4
    assert np.abs(out[-sr // 4:]).max() == 0

    unpadded = tmp_path / "unpad.wav"
    media.pad_audio_start(src, padded, 0.5)
    media.remove_audio_pad(padded, unpadded, 0.5)
    out, _ = read_wav(unpadded)
    np.testing.assert_allclose(out, read_wav(src)[0], atol=1.0 / 32_000)
