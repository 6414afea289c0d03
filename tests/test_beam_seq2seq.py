"""Jitted beam search + transformer decoder tests.

The load-bearing check: with a large beam, the beam-search top-1 equals the
exhaustive argmax over ALL token sequences under the same autoregressive
scorer (brute-forced on a tiny vocab / short max_len).
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lip2speech_tpu.decode.beam import beam_search, strip_sequence
from lip2speech_tpu.models.transformer_decoder import TransformerDecoder

V, MAXLEN = 6, 4  # tokens: bos=0 pad=1 eos=2 unk=3 + {4, 5}
BOS, EOS, PAD, UNK = 0, 2, 1, 3


def _random_scorer(seed):
    """Deterministic random autoregressive scorer: logits depend on the
    prefix through a hash-like projection (order-sensitive)."""
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.standard_normal((V, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((16, V)).astype(np.float32))

    def score_prefix(tokens, step):
        # context = position-weighted sum of embeddings of tokens[: step+1]
        t = tokens.shape[1]
        pos_w = jnp.asarray([[0.7 ** i] for i in range(t)], jnp.float32)  # (t,1)
        idx = jnp.arange(t)[None, :, None]
        valid = (jnp.arange(t) <= step)[None, :, None]
        emb = table[tokens] * pos_w[None] * valid
        ctx = emb.sum(axis=1)
        return ctx @ w

    return score_prefix


def _sequence_logprob(score_prefix, seq):
    """Exhaustive scorer: sum of per-step log-probs with pad/unk/bos banned."""
    toks = np.full(MAXLEN + 1, PAD, np.int32)
    toks[0] = BOS
    total = 0.0
    for step, tok in enumerate(seq):
        logits = np.asarray(score_prefix(jnp.asarray(toks[None]), step))[0]
        lp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
        lp = logits - (np.log(np.sum(np.exp(logits - np.max(logits)))) + np.max(logits))
        lp[PAD] = lp[UNK] = lp[BOS] = -1e30
        total += lp[tok]
        toks[step + 1] = tok
    return total


def test_beam_matches_exhaustive():
    score = _random_scorer(0)
    tokens, scores = beam_search(score, batch_size=1, beam=32, max_len=MAXLEN,
                                 bos=BOS, eos=EOS, pad=PAD, unk=UNK,
                                 len_penalty=1.0)
    best_beam = strip_sequence(np.asarray(tokens[0, 0]))
    best_score = float(scores[0, 0])

    # brute force: all sequences that end with EOS within MAXLEN steps,
    # plus un-terminated length-MAXLEN sequences
    candidates = []
    inner = [4, 5, EOS]
    for L in range(1, MAXLEN + 1):
        for seq in itertools.product(inner, repeat=L):
            if EOS in seq[:-1]:
                continue
            if seq[-1] == EOS:
                candidates.append(seq)
            elif L == MAXLEN:
                candidates.append(seq)
    scored = [( _sequence_logprob(score, s) / len(s), s) for s in candidates]
    ref_score, ref_seq = max(scored, key=lambda kv: kv[0])

    assert best_beam == [t for t in ref_seq if t != EOS], (best_beam, ref_seq)
    np.testing.assert_allclose(best_score, ref_score, rtol=1e-4)


def test_beam_batch_and_ordering():
    score = _random_scorer(1)
    tokens, scores = beam_search(score, batch_size=3, beam=4, max_len=MAXLEN,
                                 bos=BOS, eos=EOS, pad=PAD, unk=UNK)
    assert tokens.shape == (3, 4, MAXLEN + 1)
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()  # sorted best-first
    # no banned tokens in any hypothesis
    toks = np.asarray(tokens)
    for b in range(3):
        for k in range(4):
            seq = strip_sequence(toks[b, k])
            assert all(t not in (PAD, UNK, BOS) for t in seq)


def test_transformer_decoder_shapes_and_causality():
    dec = TransformerDecoder(vocab_size=V, dim=16, heads=2, ffn_dim=32, layers=2)
    rng = np.random.default_rng(2)
    enc = jnp.asarray(rng.standard_normal((2, 7, 16), dtype=np.float32))
    enc_mask = jnp.ones((2, 7), bool)
    tokens = jnp.asarray(rng.integers(0, V, (2, 5)).astype(np.int32))
    variables = dec.init(jax.random.PRNGKey(0), tokens, enc, enc_mask)
    out = dec.apply(variables, tokens, enc, enc_mask)
    assert out.shape == (2, 5, V)

    # causality: changing a future token must not affect earlier logits
    tokens2 = tokens.at[:, 4].set((tokens[:, 4] + 1) % V)
    out2 = dec.apply(variables, tokens2, enc, enc_mask)
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(out2[:, :4]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(out[:, 4]), np.asarray(out2[:, 4]))


def test_decoder_with_beam_end_to_end():
    """Greedy-consistent: beam=1 equals stepwise argmax through the decoder."""
    dec = TransformerDecoder(vocab_size=V, dim=16, heads=2, ffn_dim=32, layers=1)
    rng = np.random.default_rng(3)
    enc = jnp.asarray(rng.standard_normal((1, 6, 16), dtype=np.float32))
    enc_mask = jnp.ones((1, 6), bool)
    variables = dec.init(jax.random.PRNGKey(1), jnp.zeros((1, 1), jnp.int32),
                         enc, enc_mask)

    def score(tokens, step):
        logits = dec.apply(variables, tokens,
                           jnp.repeat(enc, tokens.shape[0], 0),
                           jnp.repeat(enc_mask, tokens.shape[0], 0))
        return logits[:, step]

    tokens, scores = beam_search(score, 1, beam=1, max_len=MAXLEN,
                                 bos=BOS, eos=EOS, pad=PAD, unk=UNK)
    hyp = strip_sequence(np.asarray(tokens[0, 0]))

    # manual greedy
    toks = np.full((1, MAXLEN + 1), PAD, np.int32)
    toks[0, 0] = BOS
    greedy = []
    for step in range(MAXLEN):
        logits = np.array(score(jnp.asarray(toks), step))[0].copy()
        logits[[PAD, UNK, BOS]] = -1e30
        t = int(logits.argmax())
        toks[0, step + 1] = t
        if t == EOS:
            break
        greedy.append(t)
    assert hyp == greedy


def test_no_repeat_ngram_blocking():
    """A scorer that loves the loop 4,5,4,5 must be broken by
    no_repeat_ngram_size=2: no bigram may appear twice in a hypothesis."""
    def loopy_score(tokens, step):
        # prefer alternating 4,5 forever: logits favor 5 after 4, 4 after 5
        last = jnp.take_along_axis(tokens, jnp.full((tokens.shape[0], 1), step,
                                                    jnp.int32), 1)[:, 0]
        base = jnp.full((tokens.shape[0], V), -3.0)
        base = jnp.where((last == 4)[:, None],
                         base.at[:, 5].set(5.0), base.at[:, 4].set(5.0))
        return base

    tokens, _ = beam_search(loopy_score, batch_size=1, beam=4, max_len=6,
                            bos=BOS, eos=EOS, pad=PAD, unk=UNK,
                            no_repeat_ngram_size=2)
    for k in range(4):
        seq = [BOS] + strip_sequence(np.asarray(tokens[0, k]))
        bigrams = list(zip(seq, seq[1:]))
        assert len(bigrams) == len(set(bigrams)), seq
    # sanity: without blocking, the top beam IS the repeating loop
    tokens2, _ = beam_search(loopy_score, batch_size=1, beam=4, max_len=6,
                             bos=BOS, eos=EOS, pad=PAD, unk=UNK)
    seq2 = strip_sequence(np.asarray(tokens2[0, 0]))
    bigrams2 = list(zip(seq2, seq2[1:]))
    assert len(bigrams2) > len(set(bigrams2)), seq2


def test_prefix_tokens_forcing():
    """Forced prefix appears verbatim in every beam; the continuation is the
    exhaustive optimum among sequences with that prefix."""
    score = _random_scorer(4)
    prefix = jnp.asarray([[5, 4]], jnp.int32)
    tokens, scores = beam_search(score, batch_size=1, beam=32, max_len=MAXLEN,
                                 bos=BOS, eos=EOS, pad=PAD, unk=UNK,
                                 prefix_tokens=prefix)
    toks = np.asarray(tokens)
    for k in range(32):
        seq = strip_sequence(toks[0, k])
        if np.asarray(scores)[0, k] < -1e20:
            continue
        assert seq[:2] == [5, 4], seq

    best = strip_sequence(toks[0, 0])
    best_score = float(scores[0, 0])

    candidates = []
    inner = [4, 5, EOS]
    for L in range(3, MAXLEN + 1):
        for tail in itertools.product(inner, repeat=L - 2):
            seq = (5, 4) + tail
            if EOS in seq[:-1]:
                continue
            if seq[-1] == EOS or L == MAXLEN:
                candidates.append(seq)
    scored = [(_sequence_logprob(score, s) / len(s), s) for s in candidates]
    ref_score, ref_seq = max(scored, key=lambda kv: kv[0])
    assert best == [t for t in ref_seq if t != EOS], (best, ref_seq)
    np.testing.assert_allclose(best_score, ref_score, rtol=1e-4)
