"""Rel-position flash kernel vs the conformer's reference rel-MHA math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lip2speech_tpu.models.conformer import rel_shift
from lip2speech_tpu.ops import nn as ops
from lip2speech_tpu.ops.pallas_rel_attention import (
    _band_extract,
    rel_flash_attention,
)


def _reference(q_u, q_v, k, v, p, mask):
    """Dense rel-MHA (same math as RelPositionMultiHeadAttention)."""
    dk = q_u.shape[-1]
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
    bd = jnp.einsum("bhqd,hpd->bhqp", q_v, p)
    bd = rel_shift(bd)
    s = (ac + bd) / float(np.sqrt(dk))
    s = jnp.where(mask[:, None, None, :], s, -1e9)
    attn = jax.nn.softmax(s, axis=-1)
    attn = jnp.where(mask[:, None, None, :], attn, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def test_band_extract_matches_gather():
    rng = np.random.default_rng(0)
    for bq, bk in [(8, 8), (8, 16), (16, 8)]:
        g = jnp.asarray(rng.standard_normal((bq, bq + bk - 1), dtype=np.float32))
        out = np.asarray(_band_extract(g, bk))
        ref = np.zeros((bq, bk), np.float32)
        gn = np.asarray(g)
        for a in range(bq):
            for b_ in range(bk):
                ref[a, b_] = gn[a, bq - 1 - a + b_]
        np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("t,lens,block", [(64, [64, 50], 32), (40, [40, 33], 16)])
def test_rel_flash_matches_dense(t, lens, block):
    rng = np.random.default_rng(1)
    b, h, dk = 2, 2, 32
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, t, dk), dtype=np.float32))  # noqa: E731
    q_u, q_v, k, v = mk(), mk(), mk(), mk()
    # position table: use the real sinusoidal table projected randomly
    pe = ops.sinusoidal_rel_pos_encoding(t, h * dk)          # (2t-1, h*dk)
    p = jnp.asarray(pe.reshape(2 * t - 1, h, dk).transpose(1, 0, 2))
    mask = np.zeros((b, t), bool)
    for i, L in enumerate(lens):
        mask[i, :L] = True
    mask = jnp.asarray(mask)

    ref = np.asarray(_reference(q_u, q_v, k, v, p, mask))
    out = np.asarray(rel_flash_attention(q_u, q_v, k, v, p, mask,
                                         block=block, interpret=True))
    m = np.asarray(mask)
    for i in range(b):
        np.testing.assert_allclose(out[i][:, m[i]], ref[i][:, m[i]], atol=3e-5)
