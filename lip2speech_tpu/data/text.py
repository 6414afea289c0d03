"""Text tokenization + CTC decoding for the optional text-supervision branch.

Rebuild of reference multi_target_lip2speech/helpers.py:15-77
(SentenceProcessor: char-level CHARS with blank=0, or sentencepiece unigram
when the model file is supplied — sentencepiece is optional in this image)
and the ctcdecode CTC beam search used at decode time
(sequence_generator.py:27-38).
"""

from __future__ import annotations

import numpy as np

# 26 chars + 0-9 + apostrophe + space; '#' = blank at index 0 (reference CHARS)
CHARS = "#abcdefghijklmnopqrstuvwxyz0123456789 '"


class SentenceProcessor:
    """Char-level by default; pass a sentencepiece model path to match the
    reference's unigram mode (lrs2lrs3_lower.model)."""

    def __init__(self, spm_model: str | None = None):
        self.blank = 0
        self.sp = None
        if spm_model is not None:
            import sentencepiece as spm  # optional dependency

            self.sp = spm.SentencePieceProcessor(model_file=spm_model)
        self.num_classes = self.sp.get_piece_size() if self.sp else len(CHARS)

    def encode(self, text: str) -> np.ndarray:
        if self.sp:
            return np.asarray(self.sp.encode(text))
        return np.array([CHARS.index(c) for c in text])

    def decode(self, indices) -> str:
        if self.sp:
            return self.sp.decode(list(int(i) for i in indices))
        return "".join(CHARS[int(i)] for i in indices)

    def is_valid(self, text: str) -> bool:
        if self.sp:
            return True
        return all(c in CHARS for c in text)

    def collapse_ctc(self, indices) -> str:
        """Greedy CTC collapse: merge repeats, drop blanks."""
        out, prev = [], None
        for i in indices:
            i = int(i)
            if i != prev and i != self.blank:
                out.append(i)
            prev = i
        return self.decode(out)


def ctc_beam_search(
    log_probs: np.ndarray,
    beam_width: int = 25,
    blank: int = 0,
) -> tuple[list[int], float]:
    """CTC prefix beam search over (T, C) log-probs.

    Replaces the C++ ctcdecode extension (reference sequence_generator.py:27).
    Returns (best label sequence, its log-probability).
    """
    t_len, _ = log_probs.shape
    # beams: prefix tuple -> (log p ending in blank, log p ending in non-blank)
    NEG = -np.inf
    beams = {(): (0.0, NEG)}

    def logsumexp(*xs):
        xs = [x for x in xs if x != NEG]
        if not xs:
            return NEG
        m = max(xs)
        return m + np.log(sum(np.exp(x - m) for x in xs))

    for t in range(t_len):
        lp = log_probs[t]
        top = np.argsort(lp)[::-1][: max(beam_width, 8)]
        new_beams: dict = {}
        for prefix, (pb, pnb) in beams.items():
            for c in top:
                c = int(c)
                p = float(lp[c])
                if c == blank:
                    nb = new_beams.setdefault(prefix, (NEG, NEG))
                    new_beams[prefix] = (logsumexp(nb[0], pb + p, pnb + p), nb[1])
                elif prefix and c == prefix[-1]:
                    # repeat: extends non-blank path as same prefix, or new
                    # prefix via the blank path
                    nb = new_beams.setdefault(prefix, (NEG, NEG))
                    new_beams[prefix] = (nb[0], logsumexp(nb[1], pnb + p))
                    ext = prefix + (c,)
                    nb2 = new_beams.setdefault(ext, (NEG, NEG))
                    new_beams[ext] = (nb2[0], logsumexp(nb2[1], pb + p))
                else:
                    ext = prefix + (c,)
                    nb2 = new_beams.setdefault(ext, (NEG, NEG))
                    new_beams[ext] = (nb2[0], logsumexp(nb2[1], pb + p, pnb + p))
        # prune
        scored = sorted(new_beams.items(),
                        key=lambda kv: logsumexp(*kv[1]), reverse=True)
        beams = dict(scored[:beam_width])

    best_prefix, (pb, pnb) = max(beams.items(), key=lambda kv: logsumexp(*kv[1]))
    return list(best_prefix), logsumexp(pb, pnb)
