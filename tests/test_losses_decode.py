"""Loss and decode semantics tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from lip2speech_tpu.core.config import UnitConfig
from lip2speech_tpu.decode import units as dec
from lip2speech_tpu.train import losses


def test_label_smoothed_ce_matches_fairseq_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    b, t, v = 2, 7, 10
    pad = 1
    logits = rng.standard_normal((b, t, v), dtype=np.float32)
    targets = rng.integers(2, v, (b, t + 1)).astype(np.int32)  # longer than logits
    targets[0, 5:] = pad
    eps = 0.1

    # torch oracle (fairseq label_smoothed_nll_loss, sum reduction)
    lt = torch.from_numpy(logits).log_softmax(-1)
    tt = torch.from_numpy(targets[:, :t]).long()
    nll = -lt.gather(-1, tt.unsqueeze(-1)).squeeze(-1)
    smooth = -lt.sum(-1)
    mask = tt.ne(pad)
    nll = (nll * mask).sum()
    smooth = (smooth * mask).sum()
    eps_i = eps / (v - 1)
    ref = (1.0 - eps - eps_i) * nll + eps_i * smooth

    loss, nll_loss, ss = losses.label_smoothed_ce(
        jnp.asarray(logits), jnp.asarray(targets), pad, eps, sentence_avg=True)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
    np.testing.assert_allclose(float(nll_loss), float(nll), rtol=1e-5)
    assert ss == b


def test_mel_loss_masked_equals_cropped():
    """Masked-loss formulation equals the reference's crop-then-ragged math."""
    rng = np.random.default_rng(1)
    b, t = 3, 20
    pred = rng.standard_normal((b, t, 80), dtype=np.float32)
    targ = rng.standard_normal((b, t, 80), dtype=np.float32)
    lens = [20, 13, 7]
    mask = np.zeros((b, t), bool)
    for i, L in enumerate(lens):
        mask[i, :L] = True

    # reference-style ragged computation
    ref = 0.0
    for i, L in enumerate(lens):
        l1 = np.abs(pred[i, :L] - targ[i, :L]).mean(-1).sum() / L
        sc = np.linalg.norm(targ[i, :L] - pred[i, :L]) / np.linalg.norm(targ[i, :L])
        ref += l1 + sc

    out = losses.mel_loss(jnp.asarray(pred), jnp.asarray(targ), jnp.asarray(mask),
                          sentence_avg=True)
    np.testing.assert_allclose(float(out), ref, rtol=1e-5)


def test_argmax_decode_bans_specials_and_masks():
    cfg = UnitConfig()
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((2, 6, cfg.vocab_size), dtype=np.float32)
    # make a special token the global argmax everywhere to prove the ban works
    logits[..., cfg.eos] = 100.0
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
    units = np.asarray(dec.argmax_units(jnp.asarray(logits), jnp.asarray(mask)))
    assert units.shape == (2, 6)
    assert (units[0, 4:] == -1).all()
    valid = units[mask]
    assert valid.min() >= 0 and valid.max() < cfg.num_units
    # equals plain argmax over the unit slice
    expect = logits[..., cfg.num_special:].argmax(-1)
    np.testing.assert_array_equal(units[mask], expect[mask])


def test_beam_units_top1_equals_argmax():
    cfg = UnitConfig()
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, 5, cfg.vocab_size), dtype=np.float32)
    mask = np.ones((2, 5), bool)
    beams = np.asarray(dec.beam_units(jnp.asarray(logits), jnp.asarray(mask), beam=4))
    assert beams.shape == (2, 4, 5)
    top1 = np.asarray(dec.argmax_units(jnp.asarray(logits), jnp.asarray(mask)))
    np.testing.assert_array_equal(beams[:, 0], top1)
    # hypotheses are distinct
    assert not np.array_equal(beams[:, 0], beams[:, 1])


def test_beam_units_exact_nbest_vs_exhaustive():
    """beam_units must return the true n-best sequences by total log-prob —
    verified against exhaustive enumeration over all V^T sequences."""
    import itertools

    import jax

    num_special = 2
    V, T, BEAM = 4, 4, 10
    rng = np.random.default_rng(11)
    logits = rng.standard_normal((2, T, num_special + V), dtype=np.float32)
    mask = np.array([[1, 1, 1, 1], [1, 1, 1, 0]], bool)

    hyps, scores = dec.beam_units(
        jnp.asarray(logits), jnp.asarray(mask), beam=BEAM,
        num_special=num_special, return_scores=True)
    hyps, scores = np.asarray(hyps), np.asarray(scores)

    lp = np.asarray(jax.nn.log_softmax(logits[..., num_special:], -1))
    for i in range(2):
        valid = np.nonzero(mask[i])[0]
        all_seqs = []
        for combo in itertools.product(range(V), repeat=len(valid)):
            s = sum(lp[i, t, c] for t, c in zip(valid, combo))
            all_seqs.append((float(s), combo))
        all_seqs.sort(key=lambda x: -x[0])
        for n in range(BEAM):
            np.testing.assert_allclose(scores[i, n], all_seqs[n][0], rtol=1e-5)
            # sequences with tied scores may legally permute; check the
            # returned hypothesis has exactly the claimed score
            got = tuple(hyps[i, n, t] for t in valid)
            got_score = sum(lp[i, t, c] for t, c in zip(valid, got))
            np.testing.assert_allclose(got_score, all_seqs[n][0], rtol=1e-5)
        # n-best set is unique
        seen = {tuple(h[valid]) for h in hyps[i]}
        assert len(seen) == BEAM
        assert (hyps[i][:, ~mask[i]] == -1).all()


def test_unit_wer():
    assert dec.unit_wer([[1, 2, 3]], [[1, 2, 3]]) == 0.0
    assert dec.unit_wer([[1, 2]], [[1, 2, 3]]) == pytest.approx(1 / 3)
    assert dec.unit_edit_distance([1, 2, 3], [1, 3]) == 1


def test_ctc_loss_runs():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((2, 12, 30), dtype=np.float32))
    mask = jnp.ones((2, 12), bool)
    labels = jnp.asarray(rng.integers(1, 30, (2, 5)).astype(np.int32))
    lengths = jnp.asarray([5, 3])
    out = losses.ctc_text_loss(logits, mask, labels, lengths)
    assert np.isfinite(float(out))
