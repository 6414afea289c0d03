"""vocode CLI (vocoder-dir -> pred_wav + RTF) and overlay pairing tests."""

import json

import numpy as np

import jax

from lip2speech_tpu.cli.overlay import main as overlay_main  # noqa: F401
from lip2speech_tpu.cli.vocode import run_vocoder
from lip2speech_tpu.models.vocoder import MelCodeGenerator

from test_server import TINY


def test_run_vocoder_on_bundled_sample(lrs3_sample_dir, tmp_path):
    gen = MelCodeGenerator(TINY.vocoder)
    code = jax.numpy.zeros((1, 4), jax.numpy.int32)
    mel = jax.numpy.zeros((1, 8, 80))
    spk = jax.numpy.zeros((1, 256))
    variables = gen.init(jax.random.PRNGKey(0), code, mel, spk, deterministic=True)

    stats = run_vocoder(TINY, variables["params"],
                        lrs3_sample_dir / "label/test.tsv",
                        lrs3_sample_dir / "label/test.unt",
                        tmp_path, root_override=lrs3_sample_dir)
    assert stats["n_utts"] == 5
    assert stats["rtf"] > 0
    wavs = list((tmp_path / "pred_wav").rglob("*.wav"))
    assert len(wavs) == 5
    from lip2speech_tpu.utils.audio_io import read_wav

    wav, sr = read_wav(wavs[0])
    assert sr == 16000 and len(wav) > 0


def test_overlay_pairing(tmp_path, monkeypatch, capsys):
    import sys

    from lip2speech_tpu.utils.audio_io import write_wav

    video_dir = tmp_path / "videos"
    wav_dir = tmp_path / "wavs"
    (video_dir / "test/a").mkdir(parents=True)
    (wav_dir / "test/a").mkdir(parents=True)
    (video_dir / "test/a/clip1.mp4").write_bytes(b"\x00")
    write_wav(wav_dir / "test/a/clip1.wav", np.zeros(160), 16000)
    write_wav(wav_dir / "test/a/orphan.wav", np.zeros(160), 16000)

    monkeypatch.setattr(sys, "argv", [
        "overlay", "--video-dir", str(video_dir),
        "--pred-wav-dir", str(wav_dir), "--out-dir", str(tmp_path / "out")])
    overlay_main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pairs"] == 1               # orphan has no matching video
    manifest = json.loads((tmp_path / "out/overlay_manifest.json").read_text())
    assert manifest[0]["video"].endswith("clip1.mp4")


def test_overlay_landmarks_and_denoise(tmp_path, monkeypatch, capsys):
    """--landmarks-dir draws a debug video (reference helpers.debug_video via
    overlay.py:37-43); --denoise-and-normalise cleans the wav in-process
    (reference overlay.py:46-53). Both run fully in-image (cv2 + ops.denoise);
    muxing itself stays gated on ffmpeg."""
    import sys

    import pytest

    cv2 = pytest.importorskip("cv2")
    if not hasattr(cv2, "VideoWriter"):
        pytest.skip("cv2 is a bare namespace package here")

    from lip2speech_tpu.utils.audio_io import write_wav

    video_dir = tmp_path / "videos"
    wav_dir = tmp_path / "wavs"
    lm_dir = tmp_path / "landmarks"
    for d in (video_dir, wav_dir, lm_dir):
        d.mkdir()
    rng = np.random.default_rng(0)
    writer = cv2.VideoWriter(str(video_dir / "clip1.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
    for _ in range(6):
        writer.write(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))
    writer.release()
    if not (video_dir / "clip1.mp4").stat().st_size:
        pytest.skip("cv2 built without an mp4 encoder")
    write_wav(wav_dir / "clip1.wav", rng.standard_normal(1600) * 0.1, 16000)
    lms = np.stack([np.tile([[10.0, 10.0]], (68, 1)) + i for i in range(6)])
    np.save(lm_dir / "clip1.npy", lms)

    monkeypatch.setattr(sys, "argv", [
        "overlay", "--video-dir", str(video_dir),
        "--pred-wav-dir", str(wav_dir), "--out-dir", str(tmp_path / "out"),
        "--landmarks-dir", str(lm_dir), "--denoise-and-normalise"])
    overlay_main()
    manifest = json.loads((tmp_path / "out/overlay_manifest.json").read_text())
    assert manifest[0]["landmarks_video"].endswith("clip1_landmarks.mp4")
    assert manifest[0]["denoised_wav"].endswith("clip1_denoised.wav")

    from lip2speech_tpu.data.video_io import load_video_gray
    from lip2speech_tpu.utils.audio_io import read_wav

    debug = load_video_gray(manifest[0]["landmarks_video"])
    assert debug.shape == (6, 48, 64)
    clean, sr = read_wav(manifest[0]["denoised_wav"])
    assert sr == 16000 and np.isfinite(clean).all()
    assert np.abs(clean).max() <= 1.0
