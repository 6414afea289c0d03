"""In-kernel attention dropout (TPU-only: interpret-mode PRNG is stubbed).

Validated on hardware (2026-08-17): deterministic per seed, seeds differ,
forward unbiased (mean over 64 seeds -> no-dropout output at ~8% rel err),
and the custom VJP consistent in expectation (seed-averaged gradient of a
linear loss -> no-dropout gradient, 6% rel err / 0.998 cosine at 96
seeds — finite differences are NOT usable here because the compiled
kernel's bf16-class noise floor exceeds the fd delta).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel dropout needs the TPU PRNG")


def _setup():
    from lip2speech_tpu.ops import nn as ops

    rng = np.random.default_rng(5)
    b, h, t, dk = 1, 2, 128, 64
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal((b, h, t, dk), dtype=np.float32))
    q_u, q_v, k, v = mk(), mk(), mk(), mk()
    pe = ops.sinusoidal_rel_pos_encoding(t, h * dk)
    p = jnp.asarray(pe.reshape(2 * t - 1, h, dk).transpose(1, 0, 2))
    mask = jnp.asarray(np.ones((b, t), bool))
    return q_u, q_v, k, v, p, mask


def test_dropout_deterministic_and_active():
    from lip2speech_tpu.ops.pallas_rel_attention import rel_flash_attention

    q_u, q_v, k, v, p, mask = _setup()

    def f(seed, rate):
        return rel_flash_attention(q_u, q_v, k, v, p, mask, block=128,
                                   dropout_rate=rate, dropout_seed=seed)

    base = np.asarray(f(0, 0.0))
    a1, a1b, a2 = (np.asarray(f(s, 0.3)) for s in (1, 1, 2))
    assert np.array_equal(a1, a1b)          # same seed -> same masks
    assert not np.allclose(a1, a2)          # different seed -> different
    assert not np.allclose(a1, base, atol=1e-3)

    acc = np.zeros_like(base)
    for s in range(48):
        acc += np.asarray(f(100 + s, 0.3))
    rel = np.abs(acc / 48 - base).mean() / (np.abs(base).mean() + 1e-9)
    assert rel < 0.2                         # unbiased in expectation


def test_dropout_backward_unbiased():
    from lip2speech_tpu.ops.pallas_rel_attention import rel_flash_attention

    q_u, q_v, k, v, p, mask = _setup()
    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.standard_normal(q_u.shape, dtype=np.float32))

    def loss(qu, seed, rate):
        out = rel_flash_attention(qu, q_v, k, v, p, mask, block=128,
                                  dropout_rate=rate, dropout_seed=seed)
        return jnp.sum(w * out)

    g0 = np.asarray(jax.grad(lambda qu: loss(qu, 0, 0.0))(q_u))
    gfn = jax.jit(jax.grad(lambda qu, s: loss(qu, s, 0.3)))
    acc = np.zeros_like(g0)
    n = 64
    for s in range(n):
        acc += np.asarray(gfn(q_u, jnp.asarray(s + 1)))
    gm = acc / n
    cos = float((gm * g0).sum() / (np.linalg.norm(gm) * np.linalg.norm(g0)))
    assert cos > 0.98
