"""In-image exercise of the Whisper ASR readback path (eval/asr.py).

Reference: test_compare.py:14-130 (Whisper-WER + viseme distance) and
server.py:341 (per-request ASR readback). The published weights aren't in
this zero-egress image, so these tests run the REAL load/generate/decode/WER
code path on a tiny random-weight Whisper built locally (tests/tiny_whisper.py).
Transcripts are garbage by construction — the assertions cover plumbing and
metric semantics (WER/viseme aggregate wiring), not recognition quality.
"""

import numpy as np
import pytest

pytest.importorskip("transformers")

from lip2speech_tpu.data.manifest import read_manifest
from lip2speech_tpu.eval.asr import WhisperASR, try_load_asr
from lip2speech_tpu.eval.harness import evaluate_synthesis
from lip2speech_tpu.utils.audio_io import read_wav, write_wav

from tests.tiny_whisper import build_tiny_whisper


@pytest.fixture(scope="module")
def tiny_whisper_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_whisper")
    return build_tiny_whisper(str(d))


def test_asr_loads_and_transcribes(tiny_whisper_dir):
    asr = try_load_asr(tiny_whisper_dir)
    assert isinstance(asr, WhisperASR)
    t = np.arange(16_000, dtype=np.float32) / 16_000
    wav = (0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    hyp = asr.run(wav)
    assert isinstance(hyp, str)


def test_try_load_asr_degrades():
    # reference degraded-startup pattern (server.py:114-131): no weights -> None
    assert try_load_asr(None) is None
    assert try_load_asr("/nonexistent/whisper") is None


def test_harness_wer_and_viseme_path(tiny_whisper_dir, lrs3_sample_dir, tmp_path):
    """Full test_compare.py semantics: STOI/ESTOI/PESQ + ASR WER + viseme."""
    utts = read_manifest(lrs3_sample_dir / "label/test.tsv",
                         root_override=lrs3_sample_dir)[:2]
    gt_text = {}
    for u in utts:
        wav, sr = read_wav(u.audio_path)
        write_wav(tmp_path / f"{u.uid}.wav", wav, sr)
        gt_text[u.uid] = "hello world this is a test phrase"

    asr = try_load_asr(tiny_whisper_dir)
    res = evaluate_synthesis(tmp_path, lrs3_sample_dir / "label/test.tsv",
                             root_override=lrs3_sample_dir,
                             groundtruth_text=gt_text, asr=asr)
    assert res.n_utts >= 1
    # WER/viseme halves of the eval triple actually computed in-image
    assert res.wer is not None and res.wer >= 0.0
    assert res.viseme_dist is not None and 0.0 <= res.viseme_dist <= 1.0
    scored = [p for p in res.per_utt.values() if "hyp" in p]
    assert scored and all(isinstance(p["hyp"], str) for p in scored)
