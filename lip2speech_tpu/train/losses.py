"""Stage-1 training losses.

Rebuild of reference multi_target_lip2speech/criterion.py:24-201:
  * label-smoothed CE on units, length-matched (truncate logits/targets to the
    common length), ignore_index = pad
  * mel loss = masked L1 (per-frame mean over bins, per-sentence mean over
    frames when sentence_avg, summed over batch) + SpectralConvergence
    (Frobenius norm ratio per sample), weighted by mel_weight
  * optional CTC text loss (weight 1)

All losses are mask-based (static shapes) — the reference's crop-to-max-length
is a no-op under masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def label_smoothed_ce(
    logits: jnp.ndarray,      # (B, T, V) unit logits at 50 Hz
    targets: jnp.ndarray,     # (B, T') int tokens (pad = pad_id), eos included
    pad_id: int,
    eps: float = 0.1,
    sentence_avg: bool = True,
):
    """fairseq label_smoothed_nll_loss with sum reduction, length-matched.

    Returns (loss, nll_loss, sample_size).
    """
    t = min(logits.shape[1], targets.shape[1])
    logits = logits[:, :t]
    targets = targets[:, :t]

    lprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lprobs, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.sum(lprobs, axis=-1)

    valid = targets != pad_id
    nll = jnp.where(valid, nll, 0.0)
    smooth = jnp.where(valid, smooth, 0.0)

    nll_loss = jnp.sum(nll)
    smooth_loss = jnp.sum(smooth)
    eps_i = eps / (logits.shape[-1] - 1)
    loss = (1.0 - eps - eps_i) * nll_loss + eps_i * smooth_loss

    # count only sentences with >=1 valid token: equal to batch size on real
    # data, and lets all-pad dummy rows (batch padding to a static size)
    # contribute zero to the normalizer
    n_sentences = jnp.sum(jnp.any(valid, axis=1))
    n_tokens = jnp.sum(valid)
    sample_size = n_sentences if sentence_avg else n_tokens
    return loss, nll_loss, sample_size


def unit_accuracy(logits, targets, pad_id):
    t = min(logits.shape[1], targets.shape[1])
    logits, targets = logits[:, :t], targets[:, :t]
    valid = targets != pad_id
    correct = (jnp.argmax(logits, axis=-1) == targets) & valid
    return jnp.sum(correct), jnp.sum(valid)


def mel_loss(
    pred: jnp.ndarray,        # (B, T, 80) predicted mel at 100 Hz
    target: jnp.ndarray,      # (B, T', 80) ground-truth mel
    mel_mask: jnp.ndarray,    # (B, T'') True = valid mel frame (4x frame mask)
    sentence_avg: bool = True,
):
    """Masked L1 + spectral convergence (criterion.py:63-89, 182-201)."""
    t = min(pred.shape[1], target.shape[1], mel_mask.shape[1])
    pred, target, mask = pred[:, :t], target[:, :t], mel_mask[:, :t]
    maskf = mask.astype(pred.dtype)

    l1 = jnp.mean(jnp.abs(pred - target), axis=-1) * maskf   # (B, T)
    denom = jnp.maximum(jnp.sum(maskf, axis=1), 1.0)
    if sentence_avg:
        l1_loss = jnp.sum(jnp.sum(l1, axis=1) / denom)
    else:
        l1_loss = jnp.sum(l1)

    # spectral convergence per sample over valid frames only
    diff_sq = jnp.sum(jnp.square(pred - target), axis=-1) * maskf
    targ_sq = jnp.sum(jnp.square(target), axis=-1) * maskf
    sc = jnp.sqrt(jnp.sum(diff_sq, axis=1)) / jnp.maximum(jnp.sqrt(jnp.sum(targ_sq, axis=1)), 1e-8)
    if sentence_avg:
        sc_loss = jnp.sum(sc)
    else:
        sc_loss = jnp.sum(sc * jnp.sum(maskf, axis=1))

    return l1_loss + sc_loss


def ctc_text_loss(logits, logit_mask, labels, label_lengths, blank_id: int = 0):
    """CTC loss on the optional text head (criterion.py:103-134), sum-reduced.

    logits: (B, T, C) at 50 Hz; labels: (B, L) padded with zeros.
    """
    logit_paddings = 1.0 - logit_mask.astype(jnp.float32)
    lab_idx = jnp.arange(labels.shape[1])[None, :]
    label_paddings = (lab_idx >= label_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                             blank_id=blank_id)
    return jnp.sum(per_seq)


def stage1_loss(
    outputs: dict,
    batch: dict,
    pad_id: int,
    label_smoothing: float = 0.1,
    mel_weight: float = 10.0,
    text_weight: float = 1.0,
    sentence_avg: bool = True,
):
    """Total stage-1 loss. batch needs: unit_tokens (B,Tu), mel (B,Tm,80),
    frames_mask (B,Tf); optionally text_labels/text_lengths."""
    ce, nll, sample_size = label_smoothed_ce(
        outputs["unit_logits"], batch["unit_tokens"], pad_id, label_smoothing, sentence_avg)

    # mel mask: frames_mask interleaved 4x (criterion.py:65)
    fm = batch["frames_mask"]
    mel_mask = jnp.repeat(fm, 4, axis=1)
    ml = mel_loss(outputs["mel"], batch["mel"], mel_mask, sentence_avg)

    loss = ce + mel_weight * ml
    logs = {"nll_loss": nll, "mel_loss": ml, "ce_loss": ce}

    if "text_logits" in outputs and "text_labels" in batch:
        ctc = ctc_text_loss(outputs["text_logits"], outputs["mask"],
                            batch["text_labels"], batch["text_lengths"])
        loss = loss + text_weight * ctc
        logs["ctc_loss"] = ctc

    n_correct, total = unit_accuracy(outputs["unit_logits"], batch["unit_tokens"], pad_id)
    logs["n_correct"], logs["total"] = n_correct, total
    logs["loss"] = loss
    return loss, sample_size, logs
