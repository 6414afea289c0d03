"""Flash-attention kernel vs jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
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


def test_flash_path_is_differentiable():
    """Gradients flow through the kernel dispatch (dense-recompute VJP) —
    the AVHubert pretraining path hits this on TPU with attn dropout 0."""
    from lip2speech_tpu.ops.pallas_attention import (_flash_diff,
                                                     reference_attention)

    rng = np.random.default_rng(3)
    b, h, t, dk = 2, 2, 24, 16
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, t, dk), dtype=np.float32))  # noqa: E731
    q, k, v = mk(), mk(), mk()
    mask = np.ones((b, t), bool)
    mask[1, 17:] = False
    mask = jnp.asarray(mask)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(_flash_diff(True, q, k, v, mask)) *
                       jnp.where(mask[:, None, :, None], 1.0, 0.0))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(reference_attention(q, k, v, mask)) *
                       jnp.where(mask[:, None, :, None], 1.0, 0.0))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, err_msg=name)
