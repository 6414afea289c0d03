"""VQ bottleneck tests: straight-through, EMA updates, recon training."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from lip2speech_tpu.models.vq import VQBottleneck, VQQuantizer


def test_vq_bottleneck_shapes_and_st_gradient():
    vq = VQBottleneck(codebook_size=8, dim=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))
    variables = vq.init(jax.random.PRNGKey(0), x, train=False)
    codes, q, commit, metrics = vq.apply(variables, x, train=False)
    assert codes.shape == (2, 6) and q.shape == x.shape
    assert float(commit) >= 0
    assert 0 < float(metrics["used_codes"]) <= 8

    # straight-through: d(q)/d(x) == identity
    def f(x_):
        _, q_, _, _ = vq.apply(variables, x_, train=False)
        return jnp.sum(q_ * 2.0)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(x), atol=1e-6)


def test_vq_ema_moves_codebook():
    vq = VQBottleneck(codebook_size=4, dim=3, mu=0.5)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 3)).astype(np.float32))
    variables = vq.init(jax.random.PRNGKey(0), x, train=False)
    before = np.asarray(variables["vq_stats"]["codebook"])
    (_, _, _, _), mutated = vq.apply(variables, x, train=True,
                                     mutable=["vq_stats"])
    after = np.asarray(mutated["vq_stats"]["codebook"])
    assert not np.allclose(before, after)


def test_vq_quantizer_trains_reconstruction():
    model = VQQuantizer(dim=16, codebook_size=8, strides=(2, 2))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = variables["params"], variables["vq_stats"]

    tx = optax.adam(1e-2)
    opt = tx.init(params)

    def loss_fn(p, s):
        (recon, _, commit, _), mut = model.apply(
            {"params": p, "vq_stats": s}, x, train=True, mutable=["vq_stats"])
        return jnp.mean(jnp.square(recon - x)) + 0.25 * commit, mut["vq_stats"]

    (l0, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
    for _ in range(30):
        (l, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
        updates, opt = tx.update(grads, opt)
        params = optax.apply_updates(params, updates)
    assert float(l) < float(l0)
