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


@pytest.mark.parametrize("impl", ["bias", "shear"])
@pytest.mark.parametrize("t,lens,block", [(64, [64, 50], 32), (40, [40, 33], 16)])
def test_rel_flash_matches_dense(t, lens, block, impl):
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
                                         block=block, interpret=True,
                                         impl=impl))
    m = np.asarray(mask)
    for i in range(b):
        np.testing.assert_allclose(out[i][:, m[i]], ref[i][:, m[i]], atol=3e-5)


def test_rel_flash_gradients_match_dense():
    """Flash attention must be trainable: its custom VJP (dense recompute)
    must reproduce autodiff gradients of the dense reference for every
    differentiable input."""
    rng = np.random.default_rng(7)
    b, h, t, dk = 2, 2, 32, 16
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, t, dk), dtype=np.float32))  # noqa: E731
    q_u, q_v, k, v = mk(), mk(), mk(), mk()
    pe = ops.sinusoidal_rel_pos_encoding(t, h * dk)
    p = jnp.asarray(pe.reshape(2 * t - 1, h, dk).transpose(1, 0, 2))
    mask = np.zeros((b, t), bool)
    mask[0, :t] = True
    mask[1, : t - 9] = True
    mask = jnp.asarray(mask)

    def loss_flash(*args):
        out = rel_flash_attention(*args, mask, block=16, interpret=True)
        return jnp.sum(jnp.sin(out) * jnp.where(mask[:, None, :, None], 1.0, 0.0))

    def loss_dense(*args):
        out = _reference(*args, mask)
        return jnp.sum(jnp.sin(out) * jnp.where(mask[:, None, :, None], 1.0, 0.0))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, p)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, p)
    for name, gf, gd in zip(("q_u", "q_v", "k", "v", "p"), g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   atol=2e-5, err_msg=name)


def test_conformer_train_step_with_flash_backward():
    """A training gradient flows through the flash path in the full layer
    (attention dropout 0 so the kernel is selected under train=True)."""
    from lip2speech_tpu.models.conformer import ConformerEncoder

    enc = ConformerEncoder(dim=32, ffn_dim=64, heads=2, layers=1,
                           dropout=0.0, attention_dropout=0.0,
                           positional_dropout=0.0, conv_kernel=7,
                           use_flash=True)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 16, 32),
                                                             dtype=np.float32))
    mask = jnp.ones((2, 16), bool)
    variables = enc.init(jax.random.PRNGKey(0), x, mask, train=False)

    def loss(params):
        (out, _), _ = enc.apply({"params": params,
                                 "batch_stats": variables["batch_stats"]},
                                x, mask, train=True,
                                rngs={"dropout": jax.random.PRNGKey(1)},
                                mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # attention projections actually received gradient
    attn_g = g["layers_0"]["self_attn"]["linear_q"]["weight"]
    assert float(jnp.abs(attn_g).max()) > 0.0


@pytest.mark.parametrize("impl", ["bias", "shear"])
@pytest.mark.parametrize("t,block", [(40, 16), (33, 16)])
def test_kernel_backward_matches_dense_backward(t, block, impl):
    """The fused flash backward kernel == dense-recompute VJP, including
    the T % block != 0 padding path."""
    rng = np.random.default_rng(11)
    b, h, dk = 2, 2, 16
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, t, dk), dtype=np.float32))  # noqa: E731
    q_u, q_v, k, v = mk(), mk(), mk(), mk()
    pe = ops.sinusoidal_rel_pos_encoding(t, h * dk)
    p = jnp.asarray(pe.reshape(2 * t - 1, h, dk).transpose(1, 0, 2))
    mask = np.zeros((b, t), bool)
    mask[0, :] = True
    mask[1, : t - 7] = True
    mask = jnp.asarray(mask)

    def loss(bwd):
        def f(*args):
            out = rel_flash_attention(*args, mask, block=block,
                                      interpret=True, bwd=bwd, impl=impl)
            return jnp.sum(jnp.cos(out) *
                           jnp.where(mask[:, None, :, None], 1.0, 0.0))
        return f

    gk = jax.grad(loss("kernel"), argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, p)
    gd = jax.grad(loss("dense"), argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, p)
    for name, a, b_ in zip(("q_u", "q_v", "k", "v", "p"), gk, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, err_msg=name)


def test_rel_flash_shard_mapped_under_mesh():
    """With a multi-device mesh declared (set_flash_mesh), the kernel
    self-wraps in shard_map — batch over 'data', heads over 'model' — and
    must reproduce the unwrapped forward AND gradients exactly. This is the
    path multi-chip training takes: GSPMD raises NotImplementedError on a
    Mosaic custom call it has to partition itself."""
    from lip2speech_tpu.ops import pallas_rel_attention as fa
    from lip2speech_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    b, h, t, dk = 4, 4, 32, 16
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, t, dk), dtype=np.float32))  # noqa: E731
    q_u, q_v, k, v = mk(), mk(), mk(), mk()
    pe = ops.sinusoidal_rel_pos_encoding(t, h * dk)
    p = jnp.asarray(pe.reshape(2 * t - 1, h, dk).transpose(1, 0, 2))
    mask = np.zeros((b, t), bool)
    mask[:, : t - 5] = True
    mask[0, :] = True
    mask = jnp.asarray(mask)

    def loss(*args):
        out = rel_flash_attention(*args, mask, block=16, interpret=True)
        return jnp.sum(jnp.sin(out) * jnp.where(mask[:, None, :, None], 1.0, 0.0))

    ref_out = np.asarray(rel_flash_attention(q_u, q_v, k, v, p, mask,
                                             block=16, interpret=True))
    ref_g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, p)

    fa.set_flash_mesh(make_mesh(data=4, model=2))  # 8 CPU devices, dp x tp
    try:
        out = np.asarray(rel_flash_attention(q_u, q_v, k, v, p, mask,
                                             block=16, interpret=True))
        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, p)
    finally:
        fa.set_flash_mesh(None)
    np.testing.assert_allclose(out, ref_out, atol=1e-6)
    for name, ga, gb in zip(("q_u", "q_v", "k", "v", "p"), g, ref_g):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-6, err_msg=name)

    # non-divisible heads/batch replicate instead of crashing
    fa.set_flash_mesh(make_mesh(data=3, model=1, devices=jax.devices()[:3]))
    try:
        out3 = np.asarray(rel_flash_attention(q_u, q_v, k, v, p, mask,
                                              block=16, interpret=True))
    finally:
        fa.set_flash_mesh(None)
    np.testing.assert_allclose(out3, ref_out, atol=1e-6)
