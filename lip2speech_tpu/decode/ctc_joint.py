"""Joint CTC/attention beam search (hybrid decoding).

TPU-native rebuild of the espnet CTC-prefix-score stack used by the RAVEn
ASR eval harness: reference raven/_espnet/nets/ctc_prefix_score.py:273-359
(CTCPrefixScore, Watanabe et al. "Hybrid CTC/Attention" Algorithm 2),
raven/_espnet/nets/scorers/ctc.py (incremental psi - psi_prev partial
scoring) and raven/_espnet/nets/beam_search.py:258-308 (pre-beam candidate
selection with everything outside the candidate set masked to -inf, then
weighted score combination (1-w)*att + w*ctc + lm_w*lm).

Design: a label-synchronous lax.scan beam (like decode/beam.py) whose carry
additionally tracks per-hypothesis CTC forward variables r (N, T, 2) and the
prefix log-probability psi (N,). The reference scores hypotheses one at a
time in a Python loop with a per-frame Python loop inside
(ctc_prefix_score.py:340-345); here the time recursion runs once as a
vectorized lax.scan over frames for ALL (hypothesis x candidate) pairs — a
single batched program XLA keeps entirely on-device.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

NEG = -1e30          # beam-level "never select"
LOGZERO = -1e10      # CTC log(0) (reference ctc_prefix_score.py:284)


def mask_ctc_logprobs(logp: jnp.ndarray, lengths: jnp.ndarray,
                      blank: int = 0) -> jnp.ndarray:
    """Neutralize padded frames: blank lp=0 (certain), others LOGZERO.

    Matches reference CTCPrefixScoreTH.extend_prob padding
    (ctc_prefix_score.py:235-236): past end-of-sequence the only emission is
    blank with probability 1, so the forward recursion carries prefix mass
    unchanged and psi/eos reads at the final frame equal reads at length-1.
    """
    t = logp.shape[1]
    valid = jnp.arange(t)[None, :] < lengths[:, None]          # (B, T)
    pad_row = jnp.full((logp.shape[-1],), LOGZERO).at[blank].set(0.0)
    return jnp.where(valid[:, :, None], logp, pad_row[None, None, :])


def ctc_initial_state(logp: jnp.ndarray, blank: int = 0) -> jnp.ndarray:
    """r0 (B, T, 2) for the empty prefix: r^n=log0, r^b=cumsum blank lp.

    Reference CTCPrefixScore.initial_state (ctc_prefix_score.py:290-302).
    """
    r_b = jnp.cumsum(logp[:, :, blank], axis=1)
    r_n = jnp.full_like(r_b, LOGZERO)
    return jnp.stack([r_n, r_b], axis=-1)


def _semiring_matmul(a, b):
    """(log, +) semiring matmul over trailing (3, 3) dims."""
    return jax.nn.logsumexp(a[..., :, :, None] + b[..., None, :, :], axis=-2)


def _ctc_recursion_parallel(xs, phi, blank_lp, r_n0, r_b0):
    """O(log T)-depth evaluation of the CTC forward recursion.

    The per-frame update
        r_n[t] = logaddexp(r_n[t-1], phi[t-1]) + xs[t]
        r_b[t] = logaddexp(r_n[t-1], r_b[t-1]) + blank[t]
    is AFFINE in the (log, +) semiring (phi comes from the PREVIOUS beam
    state, not from this recursion), so with homogeneous coordinates
    v[t] = (r_n[t], r_b[t], 0) it becomes v[t] = M[t] (.) v[t-1] with a 3x3
    semiring matrix — and all prefix products evaluate in parallel with
    jax.lax.associative_scan. Replaces the T-sequential lax.scan: depth
    log2(T) instead of T, the shape XLA wants on TPU.
    Returns (r_n (N,T-1',K), r_b, ...) stacked over t=1..T-1.
    """
    xs_t = jnp.moveaxis(xs[:, 1:], 1, 0)              # (T-1, N, K)
    phi_tm1 = jnp.moveaxis(phi[:, :-1], 1, 0)
    b_t = jnp.broadcast_to(
        jnp.moveaxis(blank_lp[:, 1:], 1, 0)[..., None], xs_t.shape)
    neg = jnp.full_like(xs_t, LOGZERO)
    zero = jnp.zeros_like(xs_t)
    m = jnp.stack([
        jnp.stack([xs_t, neg, phi_tm1 + xs_t], axis=-1),
        jnp.stack([b_t, b_t, neg], axis=-1),
        jnp.stack([neg, neg, zero], axis=-1),
    ], axis=-2)                                       # (T-1, N, K, 3, 3)
    # inclusive prefix products P[t] = M[t] (.) M[t-1] (.) ... (.) M[1]
    prefix = jax.lax.associative_scan(
        lambda a, b: _semiring_matmul(b, a), m, axis=0)
    v0 = jnp.stack([r_n0, r_b0, jnp.zeros_like(r_n0)], axis=-1)  # (N, K, 3)
    v = jax.nn.logsumexp(prefix + v0[None, ..., None, :], axis=-1)
    return v[..., 0], v[..., 1]                       # each (T-1, N, K)


def ctc_extend_scores(logp, r_prev, last, out_len, cand, blank: int,
                      eos: int, parallel_time: bool = False):
    """Score extending each hypothesis with each candidate label.

    Args:
      logp:   (N, T, V) masked CTC log-probs (mask_ctc_logprobs).
      r_prev: (N, T, 2) forward variables of the current prefixes.
      last:   (N,) last emitted label of each prefix.
      out_len: traced scalar — emitted-label count of the prefixes.
      cand:   (N, K) int candidate labels.
    Returns (psi (N, K), r_new (N, K, T, 2)) — the prefix log-prob of each
    extension and its forward state. Reference CTCPrefixScore.__call__
    (ctc_prefix_score.py:304-359), vectorized over N x K.
    """
    n, t, _ = logp.shape
    xs = jnp.take_along_axis(logp, cand[:, None, :], axis=2)     # (N, T, K)
    blank_lp = logp[:, :, blank]                                  # (N, T)
    r_sum = jnp.logaddexp(r_prev[..., 0], r_prev[..., 1])         # (N, T)
    is_last = (cand == last[:, None]) & (out_len > 0)             # (N, K)
    # phi_t(c): mass of the prefix at t that an extension by c may consume
    # (blank-ending only when c repeats the last label)
    phi = jnp.where(is_last[:, None, :], r_prev[..., 1:2], r_sum[..., None])

    l0 = out_len == 0
    r_n0 = jnp.where(l0, xs[:, 0, :], LOGZERO)                    # (N, K)
    r_b0 = jnp.full_like(r_n0, LOGZERO)
    psi0 = r_n0
    # for t<start the recursion stays at LOGZERO automatically because
    # r_prev (hence phi) has no support before frame out_len-1, so a uniform
    # scan from t=1 equals the reference's start=max(l,1) loop
    if parallel_time:
        r_n_all, r_b_all = _ctc_recursion_parallel(xs, phi, blank_lp,
                                                   r_n0, r_b0)
        # psi has no recursion at all: psi = psi0 (+) LSE_t(phi[t-1]+xs[t])
        psi = jnp.logaddexp(
            psi0, jax.nn.logsumexp(phi[:, :-1] + xs[:, 1:], axis=1))
    else:
        def step(carry, inp):
            r_n, r_b, psi = carry
            xs_t, phi_tm1, blank_t = inp
            r_n_new = jnp.logaddexp(r_n, phi_tm1) + xs_t
            r_b_new = jnp.logaddexp(r_n, r_b) + blank_t[:, None]
            psi = jnp.logaddexp(psi, phi_tm1 + xs_t)
            return (r_n_new, r_b_new, psi), (r_n_new, r_b_new)

        inputs = (jnp.moveaxis(xs[:, 1:], 1, 0),          # (T-1, N, K)
                  jnp.moveaxis(phi[:, :-1], 1, 0),
                  jnp.moveaxis(blank_lp[:, 1:], 1, 0))
        (_, _, psi), (r_n_all, r_b_all) = jax.lax.scan(
            step, (r_n0, r_b0, psi0), inputs)
    r_new = jnp.stack([
        jnp.concatenate([r_n0[:, None], jnp.moveaxis(r_n_all, 0, 1)], axis=1),
        jnp.concatenate([r_b0[:, None], jnp.moveaxis(r_b_all, 0, 1)], axis=1),
    ], axis=-1)                                                   # (N, T, K, 2)
    r_new = jnp.swapaxes(r_new, 1, 2)                             # (N, K, T, 2)

    # c == eos: prefix ends here — full-sequence probability of the prefix
    # itself (ctc_prefix_score.py:348-350); padded frames carry r_sum to T-1
    psi = jnp.where(cand == eos, r_sum[:, -1:], psi)
    # c == blank is not a label (ctc_prefix_score.py:353-355)
    psi = jnp.where(cand == blank, LOGZERO, psi)
    return psi, r_new


@functools.partial(jax.jit, static_argnames=(
    "att_score_prefix", "lm_score_prefix", "batch_size", "beam", "max_len",
    "pre_beam", "ctc_weight", "lm_weight", "bos", "eos", "pad", "unk",
    "blank", "len_penalty", "length_bonus", "parallel_time"))
def joint_beam_search(
    att_score_prefix: Callable,   # (tokens (N, L+1), step) -> (N, V) logits
    ctc_logprobs: jnp.ndarray,    # (B, T, V) log-softmaxed CTC head output
    ctc_lengths: jnp.ndarray,     # (B,) valid encoder frames
    batch_size: int,
    beam: int,
    max_len: int,
    ctc_weight: float = 0.3,
    lm_score_prefix: Callable | None = None,
    lm_weight: float = 0.0,
    bos: int = 0,
    eos: int = 2,
    pad: int = 1,
    unk: int = 3,
    blank: int = 0,
    pre_beam: int = 0,            # 0 -> espnet default int(1.5 * beam)
    len_penalty: float = 0.0,     # espnet uses raw scores (no GNMT norm)
    length_bonus: float = 0.0,    # espnet LengthBonus scorer weight (penalty)
    parallel_time: bool = False,  # O(log T) associative-scan CTC recursion
):
    """Hybrid CTC/attention beam. Returns (tokens (B, beam, L+1), scores).

    Score of appending c: (1-ctc_weight)*log p_att(c) + ctc_weight*
    (psi(h.c) - psi(h)) + lm_weight*log p_lm(c), with CTC evaluated only on
    the pre_beam best candidates by the non-CTC score and every other label
    masked to -inf — exactly the reference's pre-beam semantics
    (beam_search.py:277-286 + :199-207).
    """
    n = batch_size * beam
    v = ctc_logprobs.shape[-1]
    k = pre_beam if pre_beam > 0 else int(1.5 * beam)
    k = min(v, k)

    logp = mask_ctc_logprobs(ctc_logprobs, ctc_lengths, blank)
    logp = jnp.repeat(logp, beam, axis=0)                         # (N, T, V)
    r0 = ctc_initial_state(logp, blank)                           # (N, T, 2)
    psi0 = jnp.zeros((n,))

    tokens = jnp.full((n, max_len + 1), pad, jnp.int32).at[:, 0].set(bos)
    scores = jnp.tile(jnp.array([0.0] + [NEG] * (beam - 1)), (batch_size,))
    finished = jnp.zeros((n,), bool)

    def step_fn(carry, step):
        tokens, scores, finished, r_prev, psi_prev = carry
        att = jax.nn.log_softmax(att_score_prefix(tokens, step), axis=-1)
        base = (1.0 - ctc_weight) * att
        if lm_score_prefix is not None and lm_weight != 0.0:
            lm_lp = jax.nn.log_softmax(lm_score_prefix(tokens, step), axis=-1)
            base = base + lm_weight * lm_lp
        if length_bonus:
            # espnet LengthBonus scorer: +weight per emitted token
            base = base + length_bonus
        for banned in sorted({pad, unk, blank} | ({bos} if bos != eos else set())):
            base = base.at[:, banned].set(NEG)

        cand_base, cand = jax.lax.top_k(base, k)                  # (N, K)
        last = jax.lax.dynamic_slice_in_dim(tokens, step, 1, axis=1)[:, 0]
        psi, r_new = ctc_extend_scores(logp, r_prev, last, step, cand,
                                       blank, eos, parallel_time)
        total_cand = cand_base + ctc_weight * (psi - psi_prev[:, None])

        weighted = jnp.full((n, v), NEG)
        weighted = weighted.at[jnp.arange(n)[:, None], cand].set(total_cand)
        frozen = jnp.full((v,), NEG).at[eos].set(0.0)
        weighted = jnp.where(finished[:, None], frozen[None, :], weighted)

        cand_sum = scores[:, None] + weighted
        top_scores, top_idx = jax.lax.top_k(
            cand_sum.reshape(batch_size, beam * v), beam)
        src_beam = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)
        flat_src = (jnp.arange(batch_size)[:, None] * beam
                    + src_beam).reshape(-1)
        tok_flat = tok.reshape(-1)

        new_tokens = tokens[flat_src].at[:, step + 1].set(tok_flat)
        new_finished = finished[flat_src] | (tok_flat == eos)
        # CTC state of the chosen extension: locate the token's candidate
        # slot (guaranteed present unless the row was frozen, where the
        # state no longer matters)
        slot = jnp.argmax(cand[flat_src] == tok_flat[:, None], axis=1)
        new_r = r_new[flat_src, slot]
        new_psi = psi[flat_src, slot]
        keep = finished[flat_src]
        new_r = jnp.where(keep[:, None, None], r_prev[flat_src], new_r)
        new_psi = jnp.where(keep, psi_prev[flat_src], new_psi)
        return (new_tokens, top_scores.reshape(-1), new_finished,
                new_r, new_psi), None

    (tokens, scores, finished, _, _), _ = jax.lax.scan(
        step_fn, (tokens, scores, finished, r0, psi0), jnp.arange(max_len))

    is_eos = tokens[:, 1:] == eos
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, first_eos + 1, max_len).astype(jnp.float32)
    final = scores / jnp.power(lengths, len_penalty) if len_penalty else scores

    final = final.reshape(batch_size, beam)
    tokens = tokens.reshape(batch_size, beam, -1)
    order = jnp.argsort(-final, axis=1)
    final = jnp.take_along_axis(final, order, axis=1)
    tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
    return tokens, final
