"""Jitted batched beam search for seq2seq decoding.

TPU-native replacement for the fairseq SequenceGenerator's Python-loop beam
(reference avhubert/sequence_generator.py:20-988): a lax.scan over decode
steps with static max_len and beam width. Per step the decoder re-scores the
padded prefix under a causal mask (sequences are short; recompute beats
dynamic KV caches under XLA's static-shape model).

Semantics implemented from the fairseq beam: length-normalized scores
(len_penalty power), EOS finalization (finished beams frozen, their score
fixed), top-k over beam*vocab with the standard 2*beam candidate trick
collapsed to beam (EOS rows absorb), unk/pad banned, repeat-ngram blocking
(sequence_generator.py NGramRepeatBlock semantics: ban any token that would
complete an n-gram already present in the hypothesis) and prefix-token
forcing (the first P steps are constrained to given tokens, keeping the
model's log-prob of the forced token, fairseq _prefix_tokens).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

NEG = -1e30


@functools.partial(jax.jit, static_argnames=("score_prefix", "batch_size",
                                             "beam", "max_len", "bos", "eos",
                                             "pad", "unk", "len_penalty",
                                             "no_repeat_ngram_size"))
def beam_search(
    score_prefix: Callable,    # (tokens (N, max_len+1), step) -> (N, V) logits at step
    batch_size: int,
    beam: int,
    max_len: int,
    bos: int = 0,
    eos: int = 2,
    pad: int = 1,
    unk: int = 3,
    len_penalty: float = 1.0,
    no_repeat_ngram_size: int = 0,
    prefix_tokens: jnp.ndarray | None = None,   # (B, P) forced first tokens
):
    """Returns (tokens (B, beam, max_len+1), scores (B, beam)) sorted best-first."""
    n = batch_size * beam
    tokens = jnp.full((n, max_len + 1), pad, jnp.int32).at[:, 0].set(bos)
    scores = jnp.tile(jnp.array([0.0] + [NEG] * (beam - 1)), (batch_size,))  # (N,)
    finished = jnp.zeros((n,), bool)
    forced_all = (None if prefix_tokens is None
                  else jnp.repeat(prefix_tokens.astype(jnp.int32), beam, axis=0))

    def step_fn(carry, step):
        tokens, scores, finished = carry
        logits = score_prefix(tokens, step)                  # (N, V)
        lprobs = jax.nn.log_softmax(logits, axis=-1)
        v = lprobs.shape[-1]
        lprobs = lprobs.at[:, pad].set(NEG).at[:, unk].set(NEG)
        if bos != eos:
            lprobs = lprobs.at[:, bos].set(NEG)

        if no_repeat_ngram_size > 1:
            # ban tokens completing an n-gram already in the hypothesis
            # (fairseq NGramRepeatBlock; windows including BOS are harmless
            # since BOS never recurs). Static window stack, dynamic suffix.
            nsz = no_repeat_ngram_size
            n_win = max_len + 2 - nsz
            if n_win > 0:
                win = jnp.stack([tokens[:, t: t + n_win]
                                 for t in range(nsz - 1)], axis=-1)  # (N,S,n-1)
                st = jnp.clip(step - nsz + 2, 0, max_len + 2 - nsz)
                suffix = jax.lax.dynamic_slice_in_dim(
                    tokens, st, nsz - 1, axis=1)                     # (N, n-1)
                starts = jnp.arange(n_win)
                gate = (starts + nsz - 1 <= step) & (step >= nsz - 1)
                hits = jnp.all(win == suffix[:, None, :], -1) & gate[None, :]
                nxt = tokens[:, nsz - 1: nsz - 1 + n_win]            # (N, S)
                ban = jnp.zeros((n, v), jnp.int32).at[
                    jnp.arange(n)[:, None], nxt].max(hits.astype(jnp.int32))
                lprobs = jnp.where(ban > 0, NEG, lprobs)

        if forced_all is not None:
            # constrained decoding: step < P must take prefix_tokens[:, step]
            # at the model's own log-prob (fairseq _prefix_tokens)
            plen = forced_all.shape[1]
            tok_f = jax.lax.dynamic_slice_in_dim(
                forced_all, jnp.minimum(step, plen - 1), 1, axis=1)[:, 0]
            kept = jnp.take_along_axis(lprobs, tok_f[:, None], 1)[:, 0]
            only = jnp.full_like(lprobs, NEG).at[jnp.arange(n), tok_f].set(kept)
            lprobs = jnp.where(step < plen, only, lprobs)

        # force EOS continuation (score 0) for finished rows
        frozen = jnp.full((v,), NEG).at[eos].set(0.0)
        lprobs = jnp.where(finished[:, None], frozen[None, :], lprobs)

        cand = scores[:, None] + lprobs                      # (N, V)
        cand = cand.reshape(batch_size, beam * v)
        top_scores, top_idx = jax.lax.top_k(cand, beam)      # (B, beam)
        src_beam = top_idx // v                              # which beam it came from
        tok = (top_idx % v).astype(jnp.int32)

        flat_src = (jnp.arange(batch_size)[:, None] * beam + src_beam).reshape(-1)
        new_tokens = tokens[flat_src].at[:, step + 1].set(tok.reshape(-1))
        new_finished = finished[flat_src] | (tok.reshape(-1) == eos)
        return (new_tokens, top_scores.reshape(-1), new_finished), None

    (tokens, scores, finished), _ = jax.lax.scan(
        step_fn, (tokens, scores, finished), jnp.arange(max_len))

    # length-normalized final scores: count tokens up to+incl first EOS
    is_eos = tokens[:, 1:] == eos
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)                   # 0-based among steps
    lengths = jnp.where(any_eos, first_eos + 1, max_len).astype(jnp.float32)
    final = scores / jnp.power(lengths, len_penalty)

    final = final.reshape(batch_size, beam)
    tokens = tokens.reshape(batch_size, beam, -1)
    order = jnp.argsort(-final, axis=1)
    final = jnp.take_along_axis(final, order, axis=1)
    tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
    return tokens, final


def strip_sequence(row, bos: int = 0, eos: int = 2) -> list[int]:
    """Drop BOS and everything from the first EOS on."""
    out = []
    for t in row[1:]:
        t = int(t)
        if t == eos:
            break
        out.append(t)
    return out
