"""Tensor-parallel sharding over the 'model' axis: same numerics, sharded
weights (GSPMD inserts the collectives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lip2speech_tpu.models.conformer import ConformerEncoder
from lip2speech_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from lip2speech_tpu.parallel.sharding_rules import param_specs, shard_params

D, H, FF, LAYERS, T, B = 32, 4, 64, 2, 12, 4


@pytest.fixture(scope="module")
def enc_and_params():
    enc = ConformerEncoder(dim=D, ffn_dim=FF, heads=H, layers=LAYERS,
                           dropout=0.0, attention_dropout=0.0,
                           positional_dropout=0.0, conv_kernel=7)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x, jnp.ones((B, T), bool))
    return enc, variables, x


def test_param_specs_pick_ffn_and_attention(enc_and_params):
    _, variables, _ = enc_and_params
    specs = param_specs(variables["params"])
    l0 = specs["layers_0"]
    assert l0["feed_forward"]["w_1"]["weight"] == P(None, MODEL_AXIS)
    assert l0["feed_forward"]["w_2"]["weight"] == P(MODEL_AXIS, None)
    assert l0["self_attn"]["linear_q"]["weight"] == P(None, MODEL_AXIS)
    assert l0["self_attn"]["linear_out"]["weight"] == P(MODEL_AXIS, None)
    # norms replicated
    assert l0["norm_mha"]["weight"] == P()


def test_tp_forward_matches_replicated(enc_and_params):
    enc, variables, x = enc_and_params
    mask = jnp.ones((B, T), bool)

    ref, _ = jax.jit(lambda v, x, m: enc.apply(v, x, m, train=False))(
        variables, x, mask)
    ref = np.asarray(ref)

    mesh = make_mesh(data=4, model=2)  # 8 CPU devices
    sharded_params = shard_params(variables["params"], mesh)
    # verify some weights are actually sharded over the model axis
    w1 = sharded_params["layers_0"]["feed_forward"]["w_1"]["weight"]
    assert w1.sharding.spec == P(None, MODEL_AXIS)

    sharded_vars = {"params": sharded_params,
                    "batch_stats": variables["batch_stats"]}
    with mesh:
        out, _ = jax.jit(lambda v, x, m: enc.apply(v, x, m, train=False))(
            sharded_vars, x, mask)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_tp_fallback_on_indivisible_dims():
    """ffn=10 not divisible by model=4 -> replicate instead of crashing."""
    enc = ConformerEncoder(dim=8, ffn_dim=10, heads=2, layers=1,
                           dropout=0.0, attention_dropout=0.0,
                           positional_dropout=0.0, conv_kernel=3)
    x = jnp.zeros((2, 4, 8))
    variables = enc.init(jax.random.PRNGKey(0), x, jnp.ones((2, 4), bool))
    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(variables["params"], mesh)
    w1 = sharded["layers_0"]["feed_forward"]["w_1"]["weight"]
    assert w1.sharding.spec in (P(), P(None, None))
