"""End-to-end pipeline tests: shapes, determinism, bf16 serving mode."""

import numpy as np
import pytest

import jax.numpy as jnp

from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

from test_server import TINY


@pytest.fixture(scope="module")
def pipe():
    return Lip2SpeechPipeline.initialize_random(TINY, frames=8)


def _inputs(t=16, b=2, seed=0):
    rng = np.random.default_rng(seed)
    video = rng.standard_normal((b, t, 88, 88, 1)).astype(np.float32)
    mask = np.ones((b, t), bool)
    mask[1, 12:] = False
    spk = rng.standard_normal((b, 256)).astype(np.float32)
    return video, mask, spk


def test_synthesise_batch_shapes(pipe):
    video, mask, spk = _inputs()
    results = pipe.synthesise_batch(video, mask, spk)
    assert len(results) == 2
    assert results[0].wav.shape == (16 * 640,)
    assert results[1].wav.shape == (12 * 640,)      # masked length respected
    assert results[0].units.shape == (32,)
    assert results[1].mel.shape == (48, 80)
    assert results[0].sample_rate == 16000
    assert np.abs(results[0].wav).max() <= 1.0


def test_synthesise_deterministic(pipe):
    video, mask, spk = _inputs(seed=1)
    a = pipe.synthesise_batch(video, mask, spk)[0].wav
    b = pipe.synthesise_batch(video, mask, spk)[0].wav
    np.testing.assert_array_equal(a, b)


def test_bf16_serving_close_to_fp32(pipe):
    bf16_pipe = Lip2SpeechPipeline(TINY, pipe.stage1_variables,
                                   pipe.vocoder_params,
                                   compute_dtype=jnp.bfloat16)
    video, mask, spk = _inputs(seed=2)
    ref = pipe.synthesise_batch(video, mask, spk)[0]
    out = bf16_pipe.synthesise_batch(video, mask, spk)[0]
    assert out.wav.dtype == np.float32
    # units (discrete) should mostly agree; wav correlated with fp32
    agree = (out.units == ref.units).mean()
    assert agree > 0.8, agree
    denom = np.linalg.norm(ref.wav) * np.linalg.norm(out.wav) + 1e-9
    corr = float(ref.wav @ out.wav / denom)
    assert corr > 0.7, corr


def test_synthesise_file(pipe, tmp_path):
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (20, 96, 96), dtype=np.uint8)
    np.save(tmp_path / "clip.npy", frames)
    spk = np.zeros(256, np.float32)
    res = pipe.synthesise_file(tmp_path / "clip.npy", spk)
    assert res.wav.shape == (20 * 640,)
    assert res.units.shape == (40,)
