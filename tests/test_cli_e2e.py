"""End-to-end CLI flow on a synthetic mini dataset: create_dataset ->
train_stage1 -> infer -> vocoder-dir setup. Mirrors the reference's
test_dataset.sh pipeline (SURVEY.md §3.4)."""

import json
from pathlib import Path

import numpy as np
import pytest

from lip2speech_tpu.cli import create_dataset as cds
from lip2speech_tpu.core.config import preset
from lip2speech_tpu.data.manifest import read_manifest, write_units
from lip2speech_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    """4 synthetic clips: .npy videos + sine wavs -> dataset tree + manifests."""
    tmp = tmp_path_factory.mktemp("mini")
    raw = tmp / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    videos, audios = [], []
    for i in range(4):
        n_frames = 12 + 4 * i
        frames = rng.integers(0, 256, (n_frames, 96, 96), dtype=np.uint8)
        np.save(raw / f"clip{i}.npy", frames)
        n_samples = n_frames * 640
        t = np.arange(n_samples) / 16000
        wav = 0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)
        write_wav(raw / f"clip{i}.wav", wav, 16000)
        videos.append(raw / f"clip{i}.npy")
        audios.append(raw / f"clip{i}.wav")

    root = tmp / "dataset"
    utts = [cds.init_sample(v, a, root, f"test/clip/{i:05d}")
            for i, (v, a) in enumerate(zip(videos, audios))]
    # random unit labels at 2x frame rate
    rows = [rng.integers(0, 200, 2 * u.n_frames).astype(np.int32) for u in utts]
    cds.build_manifests(root, "test", utts, rows)
    return root


def test_created_dataset_is_loadable(mini_dataset):
    utts = read_manifest(mini_dataset / "label/test.tsv",
                         mini_dataset / "label/test.unt")
    assert len(utts) == 4
    for u in utts:
        assert u.mel_path.exists() and u.spk_emb_path.exists()
        mel = np.load(u.mel_path)
        # Tacotron mel frames = 4x video frames + 1 (center pad)
        assert abs(mel.shape[0] - 4 * u.n_frames) <= 2
        assert mel.shape[1] == 80
    assert (mini_dataset / "label/dict.unt.txt").read_text().count("\n") == 200


def test_train_and_infer_cli(mini_dataset, tmp_path):
    from lip2speech_tpu.cli.train_stage1 import main as train_main

    ckpt_dir = tmp_path / "ckpt"
    train_main([
        "--preset", "tiny",
        "--train-tsv", str(mini_dataset / "label/test.tsv"),
        "--train-unt", str(mini_dataset / "label/test.unt"),
        "--checkpoint-dir", str(ckpt_dir),
        "--max-updates", "2", "--batch-size", "2", "--update-freq", "1",
        "--save-interval", "2", "--log-interval", "1",
    ])
    ckpts = list(ckpt_dir.iterdir())
    assert any(p.name.startswith("s1_") for p in ckpts)

    # run inference with the trained checkpoint
    from lip2speech_tpu.cli.infer import run_inference
    from lip2speech_tpu.train.checkpoint import load_pytree, scan_checkpoints

    best = scan_checkpoints(ckpt_dir, "s1_")
    state = load_pytree(best)
    variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
    results = tmp_path / "synthesis"
    stats = run_inference(preset("tiny"), variables,
                          mini_dataset / "label/test.tsv",
                          mini_dataset / "label/test.unt",
                          results, batch_size=2)
    assert stats["n_utts"] == 4
    assert 0 <= stats["accuracy"] <= 100
    # artifacts like the reference (inference.py:267-317)
    assert len(list((results / "pred_mel").rglob("*.npy"))) == 4
    assert len(list((results / "pred_unit").rglob("*.txt"))) == 4
    assert list(results.glob("hypo-*.json")) and list(results.glob("wer.*"))

    hypo = json.load(open(next(results.glob("hypo-*.json"))))
    assert len(hypo["hypo"]) == 4

    # vocoder dir setup from predictions (create_dataset.py:366-428)
    voc_root = tmp_path / "vocoder_data"
    cds.setup_vocoder_dir(mini_dataset, results, voc_root, "test")
    voc_utts = read_manifest(voc_root / "label/test.tsv", voc_root / "label/test.unt")
    assert len(voc_utts) == 4
    for u in voc_utts:
        assert u.mel_path.exists()
        assert u.units is not None

    # stage 2: vocode the predictions (vocoder.sh -> inference.py), then
    # score pred_wav vs the ground-truth manifest (test_compare.py) —
    # closing the reference's full test_dataset.sh loop (SURVEY.md §3.4)
    import jax

    from lip2speech_tpu.cli.vocode import run_vocoder
    from lip2speech_tpu.eval.harness import evaluate_synthesis
    from lip2speech_tpu.models.vocoder import MelCodeGenerator

    cfg = preset("tiny")
    gen = MelCodeGenerator(cfg.vocoder)
    gparams = gen.init(
        {"params": jax.random.PRNGKey(0)},
        np.zeros((1, 8), np.int32), np.zeros((1, 16, 80), np.float32),
        np.zeros((1, 256), np.float32), deterministic=True)["params"]
    voc_out = tmp_path / "voc_out"
    stats2 = run_vocoder(cfg, gparams, voc_root / "label/test.tsv",
                         voc_root / "label/test.unt", voc_out)
    assert stats2["n_utts"] == 4 and stats2["rtf"] > 0
    wavs = list((voc_out / "pred_wav").rglob("*.wav"))
    assert len(wavs) == 4

    res = evaluate_synthesis(voc_out / "pred_wav",
                             mini_dataset / "label/test.tsv")
    # random vocoder weights: metrics exist and are finite, nothing more
    assert res.n_utts >= 1
    assert res.stoi is None or np.isfinite(res.stoi)
