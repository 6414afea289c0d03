"""Converter CLI round-trip: torch .pt -> orbax -> load into the model."""

import json
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402


def test_convert_cli_speaker(tmp_path, monkeypatch, capsys):
    from lip2speech_tpu.cli.convert import main
    from lip2speech_tpu.models import speaker as spk
    from lip2speech_tpu.train.checkpoint import load_pytree

    lstm = torch.nn.LSTM(40, 256, num_layers=3, batch_first=True)
    linear = torch.nn.Linear(256, 256)
    sd = {**{f"lstm.{k}": v for k, v in lstm.state_dict().items()},
          **{f"linear.{k}": v for k, v in linear.state_dict().items()}}
    torch.save(sd, tmp_path / "encoder.pt")

    monkeypatch.setattr(sys, "argv", [
        "convert", "--kind", "speaker",
        "--input", str(tmp_path / "encoder.pt"),
        "--output", str(tmp_path / "speaker_orbax")])
    main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_params"] > 1_000_000

    tree = load_pytree(tmp_path / "speaker_orbax")
    frames = jnp.asarray(np.random.default_rng(0)
                         .standard_normal((30, 40)).astype(np.float32))
    emb = np.asarray(spk.forward_frames(tree["params"], frames))
    assert emb.shape == (256,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)
