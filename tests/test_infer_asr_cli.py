"""infer_asr CLI (the avhubert infer_s2s.py equivalent): hypo.json + wer
artifacts from a manifest, tiny random model, char-level text."""

import json

import numpy as np

from lip2speech_tpu.cli import create_dataset as cds
from lip2speech_tpu.cli.infer_asr import main as infer_asr_main
from lip2speech_tpu.utils.audio_io import write_wav


def test_infer_asr_cli_writes_artifacts(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    utts = []
    for i in range(2):
        n_frames = 8
        frames = rng.integers(0, 256, (n_frames, 96, 96), dtype=np.uint8)
        np.save(raw / f"clip{i}.npy", frames)
        wav = 0.3 * np.sin(np.arange(n_frames * 640) / 16000 * 2 * np.pi * 220)
        write_wav(raw / f"clip{i}.wav", wav, 16000)
        utts.append(cds.init_sample(raw / f"clip{i}.npy", raw / f"clip{i}.wav",
                                    tmp_path / "ds", f"test/clip/{i:05d}"))
    rows = [rng.integers(0, 200, 2 * u.n_frames).astype(np.int32) for u in utts]
    cds.build_manifests(tmp_path / "ds", "test", utts, rows)

    transcripts = {u.uid: "hello world" for u in utts}
    (tmp_path / "refs.json").write_text(json.dumps(transcripts))

    out = tmp_path / "decode"
    infer_asr_main([
        "--tsv", str(tmp_path / "ds/label/test.tsv"),
        "--transcripts", str(tmp_path / "refs.json"),
        "--out-dir", str(out),
        "--beam", "3", "--max-len", "6", "--no-repeat-ngram", "2",
        "--encoder-dim", "32", "--encoder-heads", "2",
        "--encoder-ffn-dim", "64", "--encoder-layers", "1",
        "--decoder-heads", "2", "--decoder-ffn-dim", "64",
        "--decoder-layers", "1",
    ])

    hypos = json.loads((out / "hypo.json").read_text())
    assert len(hypos) == 2
    for uid, h in hypos.items():
        assert "hypo" in h and h["ref"] == "hello world"
        assert np.isfinite(h["score"])
    wer_text = (out / "wer.txt").read_text()
    assert wer_text.startswith("WER: ") and "n_utts: 2" in wer_text


def test_infer_asr_cli_raven_joint(tmp_path):
    """--raven --ctc-weight: hybrid decode path end-to-end."""
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(1)
    utts = []
    for i in range(2):
        frames = rng.integers(0, 256, (8, 96, 96), dtype=np.uint8)
        np.save(raw / f"c{i}.npy", frames)
        wav = 0.3 * np.sin(np.arange(8 * 640) / 16000 * 2 * np.pi * 220)
        write_wav(raw / f"c{i}.wav", wav, 16000)
        utts.append(cds.init_sample(raw / f"c{i}.npy", raw / f"c{i}.wav",
                                    tmp_path / "ds", f"test/c/{i:05d}"))
    rows = [rng.integers(0, 200, 2 * u.n_frames).astype(np.int32) for u in utts]
    cds.build_manifests(tmp_path / "ds", "test", utts, rows)

    out = tmp_path / "decode"
    infer_asr_main([
        "--tsv", str(tmp_path / "ds/label/test.tsv"),
        "--out-dir", str(out),
        "--raven", "--ctc-weight", "0.3",
        "--beam", "2", "--max-len", "5",
        "--encoder-dim", "32", "--encoder-heads", "2",
        "--encoder-ffn-dim", "64", "--encoder-layers", "1",
        "--decoder-heads", "2", "--decoder-layers", "1",
    ])
    hypos = json.loads((out / "hypo.json").read_text())
    assert len(hypos) == 2
    for h in hypos.values():
        assert np.isfinite(h["score"])
