"""MXU output-time-folded convs (ops/fold_conv.py): exactness + vocoder wiring.

The folded formulation is a pure reindexing of the same MACs, so the whole
generator must produce bit-comparable audio with VocoderConfig.mxu_fold on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lip2speech_tpu.core.config import VocoderConfig
from lip2speech_tpu.models.vocoder import MelCodeGenerator
from lip2speech_tpu.ops import fold_conv as fc
from lip2speech_tpu.ops import nn as ops


@pytest.mark.parametrize("k,d", [(3, 1), (3, 5), (7, 3), (11, 5)])
@pytest.mark.parametrize("fold", [2, 8])
def test_fold_conv1d_exact(k, d, fold):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, 16, 16)), jnp.float32) * 0.1
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    pad = (k * d - d) // 2
    ref = ops.conv1d(x, w, b, 1, pad, d)
    got = fc.fold_conv1d(x, w, b, pad, d, fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,d", [(3, 1), (3, 5), (7, 3), (11, 5), (7, 1)])
@pytest.mark.parametrize("fold,ch", [(2, 64), (4, 32), (8, 16), (8, 8)])
def test_fold_conv1d_gblock_exact(k, d, fold, ch):
    """Folded-layout G-block conv == plain conv1d, fwd and grad (the serving
    tail's packed formulation — see ops/fold_conv.py notes)."""
    rng = np.random.default_rng(1)
    T = 16 * fold
    x = jnp.asarray(rng.standard_normal((2, T, ch)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, ch, ch)), jnp.float32) * 0.1
    b = jnp.asarray(rng.standard_normal((ch,)), jnp.float32)
    pad = (k * d - d) // 2
    ref = ops.conv1d(x, w, b, 1, pad, d)
    got = fc.unfold_time(
        fc.fold_conv1d_gblock(fc.fold_time(x, fold), w, b, pad, d, fold), fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    # gradient parity (the stage-2 GAN trains through the folded generator)
    f_ref = lambda x, w, b: jnp.sum(ops.conv1d(x, w, b, 1, pad, d) ** 2)  # noqa: E731
    f_gb = lambda x, w, b: jnp.sum(fc.fold_conv1d_gblock(  # noqa: E731
        fc.fold_time(x, fold), w, b, pad, d, fold) ** 2)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    gg = jax.grad(f_gb, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   atol=2e-3, rtol=1e-4)


def test_gblock_co_ne_ci():
    """conv_post case: Co=1 from folded ch=8 input."""
    rng = np.random.default_rng(2)
    fold, ch, k = 8, 16, 7
    T = 24 * fold
    x = jnp.asarray(rng.standard_normal((1, T, ch)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, ch, 1)), jnp.float32) * 0.1
    b = jnp.asarray(rng.standard_normal((1,)), jnp.float32)
    ref = ops.conv1d(x, w, b, 1, 3, 1)
    got = fc.unfold_time(
        fc.fold_conv1d_gblock(fc.fold_time(x, fold), w, b, 3, 1, fold), fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_generator_fold_tail_parity():
    """fold_tail on/off produce the same waveform (same params)."""
    cfg_on = VocoderConfig(fold_tail=True)
    cfg_off = VocoderConfig(fold_tail=False)
    rng = np.random.default_rng(3)
    code = jnp.asarray(rng.integers(0, 200, (1, 20)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((1, 40, 80)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((1, 256)), jnp.float32)
    m_on, m_off = MelCodeGenerator(cfg_on), MelCodeGenerator(cfg_off)
    vs = m_on.init(jax.random.PRNGKey(0), code, mel, spk)
    w_on = np.asarray(m_on.apply(vs, code, mel, spk))
    w_off = np.asarray(m_off.apply(vs, code, mel, spk))
    np.testing.assert_allclose(w_on, w_off, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,s,p", [(4, 2, 1), (8, 4, 2), (11, 5, 3)])
@pytest.mark.parametrize("fold", [1, 4])
def test_fold_conv_transpose1d_exact(k, s, p, fold):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 24)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, 12, 24)), jnp.float32) * 0.1
    b = jnp.asarray(rng.standard_normal((12,)), jnp.float32)
    ref = ops.conv_transpose1d(x, w, b, s, p)
    got = fc.fold_conv_transpose1d(x, w, b, s, p, fold)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_generator_mxu_fold_parity():
    """Full MelCodeGenerator: mxu_fold on == off (same params)."""
    base = VocoderConfig(model_in_dim=80 + 2 * 8, embedding_dim=8,
                         upsample_initial_channel=64,
                         resblock_kernel_sizes=(3, 7),
                         resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)))
    folded_cfg = VocoderConfig(**{**base.__dict__, "mxu_fold": True})

    rng = np.random.default_rng(2)
    tc = 16
    code = jnp.asarray(rng.integers(0, 200, (2, tc)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((2, 2 * tc, 80)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)

    gen = MelCodeGenerator(base)
    variables = gen.init(jax.random.PRNGKey(0), code, mel, spk,
                         deterministic=True)
    ref = gen.apply(variables, code, mel, spk, deterministic=True)
    got = MelCodeGenerator(folded_cfg).apply(variables, code, mel, spk,
                                             deterministic=True)
    assert got.shape == ref.shape == (2, 320 * tc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_pick_fold():
    assert fc.pick_fold(16, 1280) == 8
    assert fc.pick_fold(64, 1280) == 2
    assert fc.pick_fold(128, 1280) == 1
    assert fc.pick_fold(16, 1284) == 4      # divisibility fallback
    assert fc.pick_fold(1, 254) == 2        # halves until it divides
