"""Training resume + validation-driven best-checkpoint selection.

Reference behaviors covered:
  * stage-2 resume restores G/D/both optimizers/step/epoch
    (multi_input_vocoder/train.py:63-98)
  * stage-1 best checkpoint selected on VALIDATION accuracy
    (conf/lrs3/multi_target.yaml: best_checkpoint_metric: accuracy)
  * micro-batch stacking pads short batches with zero-loss dummy rows instead
    of truncating to the smallest batch in the accumulation group
"""

import json

import numpy as np
import pytest

from lip2speech_tpu.cli import create_dataset as cds
from lip2speech_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mini_resume")
    raw = tmp / "raw"
    raw.mkdir()
    rng = np.random.default_rng(7)
    utts, rows = [], []
    videos, audios = [], []
    for i in range(3):
        n_frames = 10 + 2 * i
        frames = rng.integers(0, 256, (n_frames, 96, 96), dtype=np.uint8)
        np.save(raw / f"clip{i}.npy", frames)
        t = np.arange(n_frames * 640) / 16000
        write_wav(raw / f"clip{i}.wav", 0.4 * np.sin(2 * np.pi * 220 * t), 16000)
        videos.append(raw / f"clip{i}.npy")
        audios.append(raw / f"clip{i}.wav")
    root = tmp / "dataset"
    utts = [cds.init_sample(v, a, root, f"test/clip/{i:05d}")
            for i, (v, a) in enumerate(zip(videos, audios))]
    rows = [rng.integers(0, 200, 2 * u.n_frames).astype(np.int32) for u in utts]
    cds.build_manifests(root, "test", utts, rows)
    return root


def test_stage1_valid_best_and_resume(mini_dataset, tmp_path, capsys):
    from lip2speech_tpu.cli.train_stage1 import main as train_main
    from lip2speech_tpu.train.checkpoint import load_pytree

    ckpt_dir = tmp_path / "ckpt"
    common = [
        "--preset", "tiny",
        "--train-tsv", str(mini_dataset / "label/test.tsv"),
        "--train-unt", str(mini_dataset / "label/test.unt"),
        "--valid-tsv", str(mini_dataset / "label/test.tsv"),
        "--valid-unt", str(mini_dataset / "label/test.unt"),
        "--checkpoint-dir", str(ckpt_dir),
        "--batch-size", "2", "--update-freq", "1",
        "--save-interval", "1", "--log-interval", "1",
    ]
    train_main(common + ["--max-updates", "2"])
    out1 = capsys.readouterr().out
    assert '"val_acc"' in out1  # validation actually evaluated
    assert (ckpt_dir / "s1_00000002").exists()
    assert (ckpt_dir / "s1_00000000").exists()  # best-on-valid
    best = json.loads((ckpt_dir / "best.json").read_text())
    assert best["metric"] == "valid_accuracy"
    assert 0.0 <= best["accuracy"] <= 1.0

    # resume and train one more update
    train_main(common + ["--max-updates", "3", "--resume"])
    out2 = capsys.readouterr().out
    assert "resumed from update 2" in out2
    assert (ckpt_dir / "s1_00000003").exists()
    state = load_pytree(ckpt_dir / "s1_00000003")
    assert int(np.asarray(state["step"])) == 3  # optimizer step continued

    # resuming an ALREADY-COMPLETE run must not train past max_updates
    train_main(common + ["--max-updates", "3", "--resume"])
    capsys.readouterr()
    state = load_pytree(ckpt_dir / "s1_00000003")
    assert int(np.asarray(state["step"])) == 3  # unchanged
    assert not (ckpt_dir / "s1_00000004").exists()


def test_stage2_resume(lrs3_sample_dir, tmp_path, capsys):
    from lip2speech_tpu.cli.train_stage2 import main as train_main
    from lip2speech_tpu.train.checkpoint import load_pytree, scan_checkpoints

    ckpt_dir = tmp_path / "voc_ckpt"
    common = [
        "--preset", "tiny",
        "--train-tsv", str(lrs3_sample_dir / "label/test.tsv"),
        "--train-unt", str(lrs3_sample_dir / "label/test.unt"),
        "--valid-tsv", str(lrs3_sample_dir / "label/test.tsv"),
        "--valid-unt", str(lrs3_sample_dir / "label/test.unt"),
        "--root", str(lrs3_sample_dir),
        "--checkpoint-dir", str(ckpt_dir),
        "--batch-size", "2", "--checkpoint-interval", "2",
        "--validation-interval", "2", "--log-interval", "1",
    ]
    train_main(common + ["--epochs", "1"])
    out1 = capsys.readouterr().out
    assert '"val_mel_l1"' in out1
    assert '"val_batches": 2' in out1  # 5 utts / batch 2, drop-tail -> 2 batches
    first_steps = int(scan_checkpoints(ckpt_dir, "g_").name.split("_")[1])
    assert first_steps > 0

    train_main(common + ["--epochs", "2", "--resume"])
    out2 = capsys.readouterr().out
    assert f"resumed from step {first_steps}, epoch 1" in out2
    do = load_pytree(scan_checkpoints(ckpt_dir, "do_"))
    assert int(np.asarray(do["step"])) == 2 * first_steps
    assert int(np.asarray(do["epoch"])) == 2


def test_dummy_rows_contribute_zero_loss():
    """A batch padded with all-masked rows gives identical loss, sample_size,
    and accuracy counts to the unpadded batch."""
    import jax.numpy as jnp

    from lip2speech_tpu.train.losses import stage1_loss
    from lip2speech_tpu.train.stage1 import pad_batch_rows

    rng = np.random.default_rng(3)
    b, t, v = 2, 6, 20
    pad_id = 1
    batch = {
        "video": rng.standard_normal((b, t, 8, 8, 1)).astype(np.float32),
        "frames_mask": np.ones((b, t), bool),
        "spk_emb": rng.standard_normal((b, 16)).astype(np.float32),
        "unit_tokens": rng.integers(4, v, (b, 2 * t + 1)).astype(np.int32),
        "mel": rng.standard_normal((b, 4 * t, 80)).astype(np.float32),
    }
    outputs = {
        "unit_logits": jnp.asarray(rng.standard_normal((b, 2 * t + 1, v)), jnp.float32),
        "mel": jnp.asarray(rng.standard_normal((b, 4 * t, 80)), jnp.float32),
        "mask": jnp.ones((b, 2 * t + 1), bool),
    }
    loss0, ss0, logs0 = stage1_loss(outputs, {k: jnp.asarray(x) for k, x in batch.items()}, pad_id)

    padded = pad_batch_rows(batch, b + 2, pad_id)
    assert padded["video"].shape[0] == b + 2
    assert not padded["frames_mask"][b:].any()
    out_pad = {
        "unit_logits": jnp.concatenate(
            [outputs["unit_logits"],
             jnp.asarray(rng.standard_normal((2, 2 * t + 1, v)), jnp.float32)]),
        "mel": jnp.concatenate(
            [outputs["mel"], jnp.asarray(rng.standard_normal((2, 4 * t, 80)), jnp.float32)]),
        "mask": jnp.concatenate([outputs["mask"], jnp.zeros((2, 2 * t + 1), bool)]),
    }
    loss1, ss1, logs1 = stage1_loss(
        out_pad, {k: jnp.asarray(x) for k, x in padded.items() if k != "ids"}, pad_id)

    assert float(ss0) == float(ss1)  # dummy sentences don't count
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    assert int(logs0["total"]) == int(logs1["total"])


def test_stack_accum_pads_ragged_microbatches():
    from lip2speech_tpu.train.stage1 import stack_accum

    rng = np.random.default_rng(0)

    def mb(bsz, t):
        return {
            "video": rng.standard_normal((bsz, t, 8, 8, 1)).astype(np.float32),
            "frames_mask": np.ones((bsz, t), bool),
            "spk_emb": rng.standard_normal((bsz, 16)).astype(np.float32),
            "unit_tokens": rng.integers(4, 20, (bsz, 2 * t + 1)).astype(np.int32),
            "mel": rng.standard_normal((bsz, 4 * t, 80)).astype(np.float32),
            "ids": [f"u{i}" for i in range(bsz)],
        }

    stacked = stack_accum([mb(4, 6), mb(3, 8)], pad_id=1)
    assert stacked["video"].shape == (2, 4, 8, 8, 8, 1)
    assert stacked["unit_tokens"].shape == (2, 4, 17)
    assert stacked["mel"].shape == (2, 4, 32, 80)
    # no samples dropped: micro-batch 1 keeps its 3 real rows, 4th is dummy
    assert stacked["frames_mask"][1, :3].sum() == 3 * 8
    assert not stacked["frames_mask"][1, 3].any()
    # dummy unit rows are all pad
    assert (stacked["unit_tokens"][1, 3] == 1).all()
