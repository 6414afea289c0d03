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


# ---------------------------------------------------------------------------
# In-tree sentencepiece-unigram (UnigramTokenizer)
# ---------------------------------------------------------------------------

REF_VOCAB = "/root/reference/multi_target_lip2speech/data/lrs2lrs3_lower.vocab"


def _tiny_vocab(tmp_path):
    rows = [("<pad>", 0.0), ("<sos>", 0.0), ("<eos>", 0.0), ("<unk>", 0.0),
            ("▁", -4.0), ("a", -3.0), ("b", -3.5), ("ab", -4.5),
            ("▁ab", -2.0), ("▁a", -5.0), ("ba", -1.0)]
    p = tmp_path / "tiny.vocab"
    p.write_text("\n".join(f"{w}\t{s}" for w, s in rows), encoding="utf-8")
    return p


def test_unigram_viterbi_matches_bruteforce(tmp_path):
    from itertools import combinations

    from lip2speech_tpu.data.text import UnigramTokenizer

    tok = UnigramTokenizer(_tiny_vocab(tmp_path))
    text = "abab a"
    s = tok._normalize(text)

    def all_segmentations(i):
        if i == len(s):
            yield []
            return
        for j in range(i + 1, len(s) + 1):
            piece = s[i:j]
            pid = tok.piece_to_id.get(piece)
            if pid is not None and pid not in tok.specials:
                for rest in all_segmentations(j):
                    yield [pid] + rest
            if j == i + 1:  # unk single char
                for rest in all_segmentations(j):
                    yield [tok.unk_id] + rest

    def score(ids_):
        return sum(tok.unk_score if i == tok.unk_id else tok.scores[i]
                   for i in ids_)

    best = max(all_segmentations(0), key=score)
    got = list(tok.encode(text))
    np.testing.assert_allclose(score(got), score(best), rtol=1e-9)


def test_unigram_reference_vocab_roundtrip():
    import os

    import pytest as _pytest

    if not os.path.exists(REF_VOCAB):
        _pytest.skip("reference vocab not available")
    from lip2speech_tpu.data.text import UnigramTokenizer

    tok = UnigramTokenizer(REF_VOCAB)
    assert tok.vocab_size == 4000
    text = "the quick brown fox jumps over the lazy dog"
    ids = tok.encode(text)
    assert ids.dtype == np.int64 and (ids >= 0).all() and (ids < 4000).all()
    assert tok.decode(ids) == text
    # "the" is a whole trained piece (vocab line 6)
    the = tok.encode("the")
    assert len(the) == 1 and tok.pieces[int(the[0])] == "▁the"
    # segmentation beats naive char-level splitting
    char_ids = [tok.piece_to_id.get(c, tok.unk_id) for c in tok._normalize(text)]
    assert tok.scores[ids].sum() > sum(
        tok.unk_score if i == tok.unk_id else tok.scores[i] for i in char_ids)


def test_sentence_processor_unigram_mode():
    import os

    import pytest as _pytest

    if not os.path.exists(REF_VOCAB):
        _pytest.skip("reference vocab not available")
    # .model path with no sentencepiece installed falls back to sibling .vocab
    sp = SentenceProcessor(REF_VOCAB.replace(".vocab", ".model"))
    assert sp.num_classes == 4000
    out = sp.decode(sp.encode("hello world"))
    assert out == "hello world"
    # CTC blank stays 0 (<pad>), matching reference helpers.py blank=0
    assert sp.blank == 0


def test_unigram_unknown_characters():
    import os

    import pytest as _pytest

    if not os.path.exists(REF_VOCAB):
        _pytest.skip("reference vocab not available")
    from lip2speech_tpu.data.text import UnigramTokenizer

    tok = UnigramTokenizer(REF_VOCAB)
    ids = tok.encode("café ☃")        # é + snowman
    assert tok.unk_id in set(int(i) for i in ids)
    assert "⁇" in tok.decode(ids)
