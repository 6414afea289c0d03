"""In-tree unigram trainer: round-trip through the in-tree tokenizer."""

import numpy as np

from lip2speech_tpu.data.spm_train import train_unigram, write_vocab
from lip2speech_tpu.data.text import SentenceProcessor, UnigramTokenizer

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps all day",
    "quick thinking saves the day",
    "a fox and a dog walk over the hill",
    "over the hill the quick fox runs",
    "dogs and foxes are quick animals",
] * 4


def test_train_and_roundtrip(tmp_path):
    pieces = train_unigram(CORPUS, vocab_size=80, max_piece_len=6)
    assert 0 < len(pieces) <= 76
    # probabilities normalized-ish and sorted best-first
    scores = [s for _, s in pieces]
    assert scores == sorted(scores, reverse=True)
    assert all(s < 0 for s in scores)

    path = tmp_path / "uni.vocab"
    write_vocab(path, pieces)
    tok = UnigramTokenizer(path)
    # bundled-layout specials at ids 0-3
    assert tok.pieces[:4] == ["<pad>", "<sos>", "<eos>", "<unk>"]

    for line in ["the quick fox", "a lazy dog sleeps", "over the hill"]:
        ids = tok.encode(line)
        assert len(ids) > 0
        assert tok.decode(ids) == line

    # frequent words become single pieces
    the = tok.encode("the")
    assert len(the) == 1


def test_trained_vocab_via_sentence_processor(tmp_path):
    pieces = train_unigram(CORPUS, vocab_size=60, max_piece_len=6)
    path = tmp_path / "uni.vocab"
    write_vocab(path, pieces)
    sp = SentenceProcessor(str(path))
    ids = sp.encode("the quick dog")
    assert isinstance(ids, np.ndarray) and len(ids) > 0
    assert sp.decode(ids) == "the quick dog"


def test_unseen_chars_map_to_unk(tmp_path):
    pieces = train_unigram(CORPUS, vocab_size=60)
    path = tmp_path / "uni.vocab"
    write_vocab(path, pieces)
    tok = UnigramTokenizer(path)
    ids = tok.encode("zzz qqq")            # z/q seen? q in 'quick'; z in lazy
    assert len(ids) > 0                    # never crashes, always segments
