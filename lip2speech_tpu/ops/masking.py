"""Span mask sampling for masked-prediction pretraining.

Numpy re-derivation of fairseq's compute_mask_indices "static" policy as used
by AV-HuBERT input masking (reference avhubert/hubert.py:442-475,
utils_aug.py:226-381): sample ~mask_prob*T/mask_length span starts per row
(min_masks floor), overlapping spans merge.
"""

from __future__ import annotations

import numpy as np


def compute_mask_indices(
    shape: tuple[int, int],
    padding_mask: np.ndarray | None,
    mask_prob: float,
    mask_length: int,
    rng: np.random.Generator,
    min_masks: int = 2,
) -> np.ndarray:
    """(B, T) bool span mask; True = masked. Static policy, with-overlap."""
    b, t = shape
    out = np.zeros((b, t), bool)
    for i in range(b):
        seq_len = t
        if padding_mask is not None:
            seq_len = int((~padding_mask[i]).sum()) if padding_mask.dtype == bool \
                else int(padding_mask[i].sum())
        if seq_len < mask_length:
            continue
        num_mask = int(mask_prob * seq_len / float(mask_length) + rng.random())
        num_mask = max(min_masks, num_mask)
        starts = rng.choice(max(seq_len - mask_length + 1, 1),
                            size=min(num_mask, max(seq_len - mask_length + 1, 1)),
                            replace=False)
        for s in starts:
            out[i, s : s + mask_length] = True
    return out
