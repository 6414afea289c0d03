"""Small-utility tests: WAV IO, mesh helpers, profiling."""

import numpy as np
import pytest

import jax

from lip2speech_tpu.parallel import mesh as pm
from lip2speech_tpu.utils import profiling
from lip2speech_tpu.utils.audio_io import peak_normalize, read_wav, write_wav


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wav = (rng.uniform(-0.9, 0.9, 1600)).astype(np.float32)
    write_wav(tmp_path / "a.wav", wav, 16000)
    back, sr = read_wav(tmp_path / "a.wav")
    assert sr == 16000
    np.testing.assert_allclose(back, wav, atol=1.0 / 32768)


def test_wav_int16_passthrough(tmp_path):
    data = np.array([0, 100, -100, 32767, -32768], np.int16)
    write_wav(tmp_path / "b.wav", data, 8000)
    back, sr = read_wav(tmp_path / "b.wav")
    assert sr == 8000
    np.testing.assert_allclose(back, data.astype(np.float32) / 32768.0)


def test_peak_normalize():
    x = np.array([0.1, -0.5, 0.25], np.float32)
    y = peak_normalize(x, 0.95)
    assert abs(np.abs(y).max() - 0.95) < 1e-6
    z = peak_normalize(np.zeros(5), 0.95)
    assert (z == 0).all()


def test_make_mesh_and_fitting():
    mesh = pm.make_mesh()
    assert mesh.shape["data"] == jax.device_count()
    mesh2 = pm.make_mesh(data=2, model=2)
    assert mesh2.shape == {"data": 2, "model": 2}
    with pytest.raises(ValueError):
        pm.make_mesh(data=100)
    # fitting_mesh: largest divisor of the batch that fits
    assert pm.fitting_mesh(6).shape["data"] in (6, 2, 3)
    assert pm.fitting_mesh(5).shape["data"] in (5, 1)
    assert pm.fitting_mesh(16).shape["data"] == 8


def test_pad_batch_to_multiple():
    tree = {"a": np.arange(10).reshape(5, 2)}
    padded, real = pm.pad_batch_to_multiple(tree, 4)
    assert real == 5
    assert padded["a"].shape == (8, 2)
    np.testing.assert_array_equal(padded["a"][5:], np.tile(padded["a"][:1], (3, 1)))


def test_stage_timer():
    t = profiling.StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    m = profiling.TokensPerSecond()
    m.update(100)
    assert m.avg > 0
