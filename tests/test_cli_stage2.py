"""Stage-2 trainer CLI smoke + dataset combine on the bundled sample."""

import numpy as np

from lip2speech_tpu.cli.create_dataset import combine_datasets
from lip2speech_tpu.data.manifest import read_manifest


def test_train_stage2_cli_smoke(lrs3_sample_dir, tmp_path):
    from lip2speech_tpu.cli.train_stage2 import main as train_main

    ckpt_dir = tmp_path / "voc_ckpt"
    train_main([
        "--preset", "tiny",
        "--train-tsv", str(lrs3_sample_dir / "label/test.tsv"),
        "--train-unt", str(lrs3_sample_dir / "label/test.unt"),
        "--root", str(lrs3_sample_dir),
        "--checkpoint-dir", str(ckpt_dir),
        "--epochs", "1", "--batch-size", "2",
        "--checkpoint-interval", "2", "--log-interval", "1",
        "--mel-aug",
    ])
    names = [p.name for p in ckpt_dir.iterdir()]
    assert any(n.startswith("g_") for n in names)
    assert any(n.startswith("do_") for n in names)


def test_combine_datasets(lrs3_sample_dir, tmp_path):
    out = tmp_path / "combined"
    combine_datasets([lrs3_sample_dir, lrs3_sample_dir], out, "test")
    utts = read_manifest(out / "label/test.tsv", out / "label/test.unt")
    assert len(utts) == 10  # 5 + 5
    for u in utts[:2]:
        assert u.mel_path.exists()
        assert u.spk_emb_path.exists()
        assert u.units is not None
