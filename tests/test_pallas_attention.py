"""Flash-attention kernel vs jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lip2speech_tpu.ops import pallas_attention as pa


@pytest.mark.parametrize("t,lens", [(64, [64, 40]), (100, [100, 77])])
def test_flash_matches_reference(t, lens):
    rng = np.random.default_rng(0)
    b, h, dk = 2, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, dk), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, dk), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, dk), dtype=np.float32))
    mask = np.zeros((b, t), bool)
    for i, L in enumerate(lens):
        mask[i, :L] = True
    mask = jnp.asarray(mask)

    ref = np.asarray(pa.reference_attention(q, k, v, mask))
    out = np.asarray(pa.flash_attention(q, k, v, mask, block_q=32, block_k=32,
                                        interpret=True))
    assert out.shape == ref.shape
    # compare where queries are valid (padded-query rows attend only to
    # valid keys in both, but are unused downstream anyway)
    m = np.asarray(mask)
    for i in range(b):
        np.testing.assert_allclose(out[i][:, m[i]], ref[i][:, m[i]], atol=2e-5)


def test_flash_handles_nonmultiple_lengths():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 50, 32), dtype=np.float32))
    mask = jnp.ones((1, 50), bool)
    out = np.asarray(pa.flash_attention(q, q, q, mask, block_q=32, block_k=32,
                                        interpret=True))
    ref = np.asarray(pa.reference_attention(q, q, q, mask))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_dispatch_uses_reference_off_tpu():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 1, 16, 16), dtype=np.float32))
    mask = jnp.ones((1, 16), bool)
    out = pa.attention(q, q, q, mask)  # CPU -> jnp path
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(pa.reference_attention(q, q, q, mask)),
                               atol=1e-6)
