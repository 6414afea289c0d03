"""Joint CTC/attention beam search vs the reference's OWN CTCPrefixScore.

Oracles:
  * the real espnet CTCPrefixScore (raven/_espnet/nets/ctc_prefix_score.py:273)
    run label-synchronously exactly as the reference beam does;
  * exhaustive enumeration of every possible label sequence with the joint
    score (1-w)*att + w*ctc computed through the reference scorer.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from tests.ref_oracle import ctc_prefix_score_cls

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lip2speech_tpu.decode.beam import beam_search  # noqa: E402
from lip2speech_tpu.decode.ctc_joint import (  # noqa: E402
    ctc_extend_scores, ctc_initial_state, joint_beam_search,
    mask_ctc_logprobs)

BLANK, PAD, UNK = 0, 1, 1


def _rand_logp(rng, t, v):
    x = rng.standard_normal((t, v))
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def test_prefix_scores_match_reference_scorer():
    """psi and forward variables equal the reference for random prefixes."""
    CTCPrefixScore = ctc_prefix_score_cls()
    rng = np.random.default_rng(0)
    t, v, eos = 7, 6, 5
    logp = _rand_logp(rng, t, v)
    ref = CTCPrefixScore(logp, BLANK, eos, np)
    cs = np.arange(v)

    # walk a few prefixes: empty, then grow by the reference's own best label
    y = [eos]                      # espnet convention: y[0] = sos
    r_ref = ref.initial_state()
    ours_r = ctc_initial_state(jnp.asarray(logp)[None], BLANK)[0]
    np.testing.assert_allclose(np.asarray(ours_r), r_ref, rtol=0, atol=1e-4)

    for step in range(3):
        psi_ref, states_ref = ref(np.array(y), cs, r_ref)
        psi_ours, r_ours = ctc_extend_scores(
            jnp.asarray(logp)[None], jnp.asarray(np.asarray(ours_r))[None],
            jnp.asarray([y[-1]]), jnp.asarray(step), jnp.asarray(cs)[None],
            BLANK, eos)
        np.testing.assert_allclose(np.asarray(psi_ours)[0], psi_ref,
                                   rtol=0, atol=1e-4)
        # forward variables for every non-degenerate candidate. The
        # reference allocates r with np.ndarray and only writes rows
        # >= start-1 (ctc_prefix_score.py:316-322) — rows below the prefix
        # support hold garbage, so compare the defined region only.
        lo = max(step, 1) - 1
        for c in range(v):
            if c in (BLANK,):
                continue
            np.testing.assert_allclose(
                np.asarray(r_ours)[0, c, lo:], states_ref[c][lo:],
                rtol=0, atol=1e-4, err_msg=f"step {step} candidate {c}")
            # below the support both are effectively log(0)
            assert np.all(np.asarray(r_ours)[0, c, :lo] < -1e9)
        # extend with the best real label (not blank/eos)
        best = max((c for c in range(v) if c not in (BLANK, eos)),
                   key=lambda c: psi_ref[c])
        y.append(best)
        r_ref = states_ref[best]
        ours_r = np.asarray(r_ours)[0, best]


def _markov_att(rng, v):
    """Attention scorer whose logits depend only on the previous token —
    lets the exhaustive oracle recompute scores without a model."""
    w = rng.standard_normal((v, v)).astype(np.float32)

    def score_prefix(tokens, step):
        prev = jax.lax.dynamic_slice_in_dim(tokens, step, 1, axis=1)[:, 0]
        return jnp.asarray(w)[prev]

    return w, score_prefix


def test_joint_beam_matches_exhaustive_enumeration():
    """Big-beam joint search finds the true argmax sequence, scored through
    the reference CTCPrefixScore."""
    CTCPrefixScore = ctc_prefix_score_cls()
    rng = np.random.default_rng(1)
    t, v = 5, 5
    eos = bos = 4                      # espnet: sos == eos == V-1
    labels = [2, 3]
    max_len, w_ctc = 3, 0.4
    logp = _rand_logp(rng, t, v)
    ref = CTCPrefixScore(logp, BLANK, eos, np)
    wmat, score_prefix = _markov_att(rng, v)

    def att_lp(prev, c):
        row = wmat[prev]
        return row[c] - np.log(np.exp(row).sum())

    # exhaustive: every sequence of real labels, finished (+eos) or not
    best_score, best_seq = -np.inf, None
    for m in range(0, max_len + 1):
        for seq in itertools.product(labels, repeat=m):
            # attention chain
            att = sum(att_lp([bos, *seq][i], tok) for i, tok in enumerate(seq))
            # ctc psi chain through the reference scorer
            r = ref.initial_state()
            psi_val = 0.0
            y = [bos]
            ok = True
            for tok in seq:
                psi, states = ref(np.array(y), np.arange(v), r)
                if psi[tok] < -1e9:
                    ok = False
                    break
                psi_val, r = psi[tok], states[tok]
                y.append(tok)
            if not ok:
                continue
            if m < max_len:            # finished with eos
                psi_full, _ = ref(np.array(y), np.arange(v), r)
                att_e = att + att_lp(y[-1], eos)
                score = (1 - w_ctc) * att_e + w_ctc * psi_full[eos]
                if score > best_score:
                    best_score, best_seq = score, seq + (eos,)
            else:                      # ran out of budget, unfinished
                score = (1 - w_ctc) * att + w_ctc * psi_val
                if score > best_score:
                    best_score, best_seq = score, seq

    tokens, scores = joint_beam_search(
        score_prefix, jnp.asarray(logp)[None], jnp.asarray([t]),
        batch_size=1, beam=32, max_len=max_len, ctc_weight=w_ctc,
        bos=bos, eos=eos, pad=PAD, unk=UNK, blank=BLANK, pre_beam=v)
    got = [int(x) for x in np.asarray(tokens)[0, 0, 1:]]
    want = list(best_seq) + [PAD] * (max_len - len(best_seq))
    # normalize: everything after first eos is frozen to eos by the beam
    if eos in got:
        got = got[: got.index(eos) + 1] + [PAD] * (max_len - got.index(eos) - 1)
    assert got == want, (got, want, best_score, float(scores[0, 0]))
    np.testing.assert_allclose(float(scores[0, 0]), best_score, atol=1e-4)


def test_ctc_weight_zero_reduces_to_plain_beam():
    rng = np.random.default_rng(2)
    t, v, bos, eos = 4, 7, 0, 2
    logp = _rand_logp(rng, t, v)
    _, score_prefix = _markov_att(rng, v)
    jt, js = joint_beam_search(
        score_prefix, jnp.asarray(logp)[None], jnp.asarray([t]),
        batch_size=1, beam=3, max_len=4, ctc_weight=0.0,
        bos=bos, eos=eos, pad=1, unk=3, blank=1, pre_beam=v,
        len_penalty=1.0)
    bt, bs = beam_search(score_prefix, 1, 3, 4, bos=bos, eos=eos, pad=1,
                         unk=3)
    np.testing.assert_array_equal(np.asarray(jt), np.asarray(bt))
    np.testing.assert_allclose(np.asarray(js), np.asarray(bs), atol=1e-5)


def test_padded_frames_do_not_change_scores():
    """Appending masked frames leaves psi and the beam result unchanged."""
    rng = np.random.default_rng(3)
    t, v, eos = 5, 5, 4
    logp = _rand_logp(rng, t, v)
    padded = np.concatenate([logp, rng.standard_normal((3, v))], axis=0)
    _, score_prefix = _markov_att(rng, v)
    kw = dict(batch_size=1, beam=4, max_len=3, ctc_weight=0.5, bos=eos,
              eos=eos, pad=1, unk=1, blank=0, pre_beam=v)
    t1, s1 = joint_beam_search(score_prefix, jnp.asarray(logp)[None],
                               jnp.asarray([t]), **kw)
    t2, s2 = joint_beam_search(score_prefix, jnp.asarray(padded)[None],
                               jnp.asarray([t]), **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)


def test_length_bonus_prefers_longer_sequences():
    """espnet LengthBonus: positive bonus discourages early EOS."""
    rng = np.random.default_rng(4)
    t, v, eos = 5, 5, 4
    logp = _rand_logp(rng, t, v)
    _, score_prefix = _markov_att(rng, v)
    kw = dict(batch_size=1, beam=8, max_len=4, ctc_weight=0.3, bos=eos,
              eos=eos, pad=1, unk=1, blank=0, pre_beam=v)
    def hyp_len(tok):
        row = [int(x) for x in np.asarray(tok)[0, 0, 1:]]
        return row.index(eos) if eos in row else len(row)
    t0, _ = joint_beam_search(score_prefix, jnp.asarray(logp)[None],
                              jnp.asarray([t]), **kw)
    t1, _ = joint_beam_search(score_prefix, jnp.asarray(logp)[None],
                              jnp.asarray([t]), length_bonus=5.0, **kw)
    assert hyp_len(t1) >= hyp_len(t0)


def test_parallel_time_recursion_matches_sequential():
    """Associative-scan CTC recursion == lax.scan recursion (support region)."""
    from lip2speech_tpu.decode.ctc_joint import ctc_extend_scores, \
        ctc_initial_state, mask_ctc_logprobs

    rng = np.random.default_rng(5)
    n, t, v, k = 3, 9, 6, 6
    logp = np.stack([_rand_logp(rng, t, v) for _ in range(n)])
    logp = np.asarray(mask_ctc_logprobs(jnp.asarray(logp),
                                        jnp.asarray([t, t - 2, t - 4]), 0))
    cand = np.tile(np.arange(v), (n, 1))
    r = np.asarray(ctc_initial_state(jnp.asarray(logp), 0))
    last = np.array([5, 5, 5])
    for step in range(3):
        args = (jnp.asarray(logp), jnp.asarray(r), jnp.asarray(last),
                jnp.asarray(step), jnp.asarray(cand), 0, 5)
        psi_s, r_s = ctc_extend_scores(*args, False)
        psi_p, r_p = ctc_extend_scores(*args, True)
        np.testing.assert_allclose(np.asarray(psi_p), np.asarray(psi_s),
                                   rtol=0, atol=1e-3)
        rs, rp = np.asarray(r_s), np.asarray(r_p)
        support = rs > -1e9
        np.testing.assert_allclose(rp[support], rs[support], rtol=0, atol=1e-3)
        assert np.all(rp[~support] < -1e9)
        # advance all rows with label 2
        r = rs[:, 2]
        last = np.full(n, 2)


def test_joint_beam_parallel_time_same_result():
    rng = np.random.default_rng(6)
    t, v, eos = 6, 5, 4
    logp = _rand_logp(rng, t, v)
    _, score_prefix = _markov_att(rng, v)
    kw = dict(batch_size=1, beam=4, max_len=4, ctc_weight=0.4, bos=eos,
              eos=eos, pad=1, unk=1, blank=0, pre_beam=v)
    t1, s1 = joint_beam_search(score_prefix, jnp.asarray(logp)[None],
                               jnp.asarray([t]), **kw)
    t2, s2 = joint_beam_search(score_prefix, jnp.asarray(logp)[None],
                               jnp.asarray([t]), parallel_time=True, **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-3)
