"""Rematerialization: identical forward/grads, checkpointed backward."""

import numpy as np

import jax
import jax.numpy as jnp

from lip2speech_tpu.models.conformer import ConformerEncoder


def test_remat_matches_plain():
    kw = dict(dim=16, ffn_dim=32, heads=2, layers=2, dropout=0.0,
              attention_dropout=0.0, positional_dropout=0.0, conv_kernel=3)
    enc = ConformerEncoder(**kw)
    enc_r = ConformerEncoder(**kw, remat=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 16), dtype=np.float32))
    mask = jnp.ones((2, 6), bool)
    variables = enc.init(jax.random.PRNGKey(0), x, mask)

    def loss(params, module):
        out, _ = module.apply({"params": params,
                               "batch_stats": variables["batch_stats"]},
                              x, mask, train=False)
        return jnp.sum(jnp.square(out))

    l0, g0 = jax.value_and_grad(loss)(variables["params"], enc)
    l1, g1 = jax.value_and_grad(loss)(variables["params"], enc_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
