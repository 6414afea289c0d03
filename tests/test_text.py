"""Text tokenizer + CTC beam search tests."""

import numpy as np
import pytest

from lip2speech_tpu.data.text import CHARS, SentenceProcessor, ctc_beam_search


def test_sentence_processor_roundtrip():
    sp = SentenceProcessor()
    assert sp.num_classes == 39
    assert sp.blank == 0
    text = "hello world's 42"
    enc = sp.encode(text)
    assert sp.decode(enc) == text
    assert sp.is_valid(text)
    assert not sp.is_valid("Hello!")  # uppercase/punct not in CHARS


def test_collapse_ctc():
    sp = SentenceProcessor()
    h = CHARS.index("h")
    i = CHARS.index("i")
    assert sp.collapse_ctc([0, h, h, 0, i, i, i, 0]) == "hi"
    assert sp.collapse_ctc([h, i]) == "hi"
    assert sp.collapse_ctc([0, 0]) == ""


def _logits_for(seq, n_classes, t_per=3, blank_every=True):
    """Build log-probs that strongly favor the given label sequence."""
    rows = []
    for c in seq:
        for _ in range(t_per):
            row = np.full(n_classes, -10.0)
            row[c] = 0.0
            rows.append(row)
        if blank_every:
            row = np.full(n_classes, -10.0)
            row[0] = 0.0
            rows.append(row)
    lp = np.stack(rows)
    return lp - np.logaddexp.reduce(lp, axis=1, keepdims=True)


def test_ctc_beam_search_greedy_case():
    sp = SentenceProcessor()
    target = "cab"
    seq = [CHARS.index(c) for c in target]
    lp = _logits_for(seq, sp.num_classes)
    labels, score = ctc_beam_search(lp, beam_width=8)
    assert sp.decode(labels) == target
    assert np.isfinite(score)


def test_ctc_beam_search_repeated_chars():
    """'aa' requires a blank between repeats — beam must keep both a's."""
    sp = SentenceProcessor()
    a = CHARS.index("a")
    lp = _logits_for([a, a], sp.num_classes, t_per=2, blank_every=True)
    labels, _ = ctc_beam_search(lp, beam_width=8)
    assert sp.decode(labels) == "aa"


def test_ctc_beam_matches_exhaustive_on_tiny_problem():
    """Brute-force marginalization over all alignments on a 4-frame problem."""
    rng = np.random.default_rng(0)
    t_len, n_classes = 4, 3
    lp = rng.standard_normal((t_len, n_classes))
    lp = lp - np.logaddexp.reduce(lp, axis=1, keepdims=True)

    from itertools import product

    def collapse(path):
        out, prev = [], None
        for c in path:
            if c != prev and c != 0:
                out.append(c)
            prev = c
        return tuple(out)

    scores: dict = {}
    for path in product(range(n_classes), repeat=t_len):
        s = sum(lp[t, c] for t, c in enumerate(path))
        key = collapse(path)
        scores[key] = np.logaddexp(scores.get(key, -np.inf), s)
    best_true = max(scores.items(), key=lambda kv: kv[1])

    labels, score = ctc_beam_search(lp, beam_width=32)
    assert tuple(labels) == best_true[0]
    np.testing.assert_allclose(score, best_true[1], atol=1e-6)
