"""Evaluation harness on the bundled sample audio (self-vs-self and degraded)."""

import numpy as np

from lip2speech_tpu.eval.harness import (
    evaluate_pair,
    evaluate_synthesis,
    load_groundtruth_csv,
)
from lip2speech_tpu.data.manifest import read_manifest
from lip2speech_tpu.utils.audio_io import read_wav, write_wav


def test_evaluate_pair_identity_and_noise(lrs3_sample_dir):
    wav, _ = read_wav(lrs3_sample_dir / "audio/test/UmvOgW6iV2s/00001.wav")
    same = evaluate_pair(wav, wav)
    assert same["stoi"] > 0.99 and same["estoi"] > 0.99
    rng = np.random.default_rng(0)
    noisy = wav + rng.normal(0, 0.05, len(wav)).astype(np.float32)
    deg = evaluate_pair(noisy, wav)
    assert deg["stoi"] < same["stoi"]
    assert 0 < deg["estoi"] < 1


def test_evaluate_synthesis_directory(lrs3_sample_dir, tmp_path):
    """Write degraded copies as 'predictions' and score them."""
    utts = read_manifest(lrs3_sample_dir / "label/test.tsv",
                         root_override=lrs3_sample_dir)
    rng = np.random.default_rng(1)
    for u in utts:
        wav, sr = read_wav(u.audio_path)
        noisy = wav + rng.normal(0, 0.02, len(wav)).astype(np.float32)
        write_wav(tmp_path / f"{u.uid}.wav", noisy, sr)

    res = evaluate_synthesis(tmp_path, lrs3_sample_dir / "label/test.tsv",
                             root_override=lrs3_sample_dir)
    assert res.n_utts >= 4          # the shortest clip may be < 384 ms of speech
    assert 0.5 < res.stoi <= 1.0
    assert 0.0 < res.estoi <= 1.0
    # in-tree P.862 implementation (eval/pesq_p862.py) — mildly noisy
    # copies of the reference should score well above the 1.0 floor
    assert res.pesq is not None and 1.0 < res.pesq <= 4.64
    out = res.to_json()
    assert "stoi" in out
    # schema-enforced PESQ caveat (VERDICT r4 next #8): whenever a PESQ
    # number exists, the record must carry its anchoring so an in-tree
    # (approximate, relative-only) score can never be quoted as ITU MOS-LQO
    assert res.pesq_anchor in ("itu", "relative-only")
    assert "pesq_anchor" in out


def test_pesq_caveat_in_pair_schema(lrs3_sample_dir):
    from lip2speech_tpu.eval import metrics as M

    wav, _ = read_wav(lrs3_sample_dir / "audio/test/UmvOgW6iV2s/00001.wav")
    pair = evaluate_pair(wav, wav)
    if "pesq" in pair:
        assert pair["pesq_anchor"] == (
            "itu" if M.pesq_impl() == "itu" else "relative-only")
        assert pair["pesq_mode"] == "nb"


def test_groundtruth_csv(tmp_path):
    (tmp_path / "gt.csv").write_text(
        "Video Name,Phrase\nclip1,hello world\nclip2,good morning\n")
    d = load_groundtruth_csv(tmp_path / "gt.csv")
    assert d == {"clip1": "hello world", "clip2": "good morning"}
