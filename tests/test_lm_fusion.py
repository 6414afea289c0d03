"""Transformer LM + shallow fusion tests."""

import numpy as np

import jax
import jax.numpy as jnp

from lip2speech_tpu.decode.beam import beam_search, strip_sequence
from lip2speech_tpu.models.lm import TransformerLM, fuse_with_lm

V = 8
BOS, PAD, EOS, UNK = 0, 1, 2, 3


def test_lm_causality_and_shapes():
    lm = TransformerLM(vocab_size=V, dim=16, heads=2, ffn_dim=32, layers=2)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, V, (2, 6)).astype(np.int32))
    variables = lm.init(jax.random.PRNGKey(0), toks)
    out = lm.apply(variables, toks)
    assert out.shape == (2, 6, V)
    toks2 = toks.at[:, 5].set((toks[:, 5] + 1) % V)
    out2 = lm.apply(variables, toks2)
    np.testing.assert_allclose(np.asarray(out[:, :5]), np.asarray(out2[:, :5]),
                               atol=1e-6)


def test_shallow_fusion_changes_beam_output():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((V, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8, V)).astype(np.float32))

    def am(tokens, step):
        valid = (jnp.arange(tokens.shape[1]) <= step)[None, :, None]
        ctx = (table[tokens] * valid).sum(axis=1)
        return ctx @ w

    lm = TransformerLM(vocab_size=V, dim=16, heads=2, ffn_dim=32, layers=1)
    variables = lm.init(jax.random.PRNGKey(2), jnp.zeros((1, 3), jnp.int32))

    base_toks, base_scores = beam_search(am, 1, beam=4, max_len=5,
                                         bos=BOS, eos=EOS, pad=PAD, unk=UNK)
    # heavy LM weight to force a different ranking
    fused = fuse_with_lm(am, lm, variables, lm_weight=5.0)
    fus_toks, fus_scores = beam_search(fused, 1, beam=4, max_len=5,
                                       bos=BOS, eos=EOS, pad=PAD, unk=UNK)
    assert base_toks.shape == fus_toks.shape
    # scores differ; hypotheses valid under both
    assert not np.allclose(np.asarray(base_scores), np.asarray(fus_scores))
    for row in np.asarray(fus_toks)[0]:
        seq = strip_sequence(row)
        assert all(t not in (PAD, UNK, BOS) for t in seq)
