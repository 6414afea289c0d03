"""AV-HuBERT seq2seq ASR (lipreading) — the infer_s2s path.

Rebuild of reference avhubert/hubert_asr.py:411-516 (AVHubertSeq2Seq) +
infer_s2s.py:50-318: AV-HuBERT video encoder -> transformer decoder -> jitted
beam search -> text. Not used by the lip2speech product path but part of the
reference's model inventory (SURVEY.md §2.2).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.decode.beam import beam_search, strip_sequence
from lip2speech_tpu.models.avhubert import AVHubertVideoEncoder
from lip2speech_tpu.models.transformer_decoder import TransformerDecoder


@dataclass
class Seq2SeqConfig:
    vocab_size: int = 1000          # sentencepiece unigram vocab
    encoder_dim: int = 1024
    encoder_heads: int = 16
    encoder_ffn_dim: int = 4096
    encoder_layers: int = 24
    decoder_dim: int = 768
    decoder_heads: int = 4
    decoder_ffn_dim: int = 3072
    decoder_layers: int = 6
    bos: int = 0
    pad: int = 1
    eos: int = 2
    unk: int = 3


class AVHubertSeq2Seq:
    """Bundles encoder+decoder modules with init/apply/decode helpers."""

    def __init__(self, cfg: Seq2SeqConfig):
        self.cfg = cfg
        self.encoder = AVHubertVideoEncoder(
            dim=cfg.encoder_dim, heads=cfg.encoder_heads,
            ffn_dim=cfg.encoder_ffn_dim, layers=cfg.encoder_layers)
        # decoder dim may differ from encoder dim; cross-attn projects k/v
        # from the encoder width, so feed encoder outs through as-is when the
        # dims match, otherwise the decoder's k/v projections handle it only
        # if we give them the right input width — fairseq inserts no extra
        # projection, so we size the decoder at the encoder width when needed
        self.decoder = TransformerDecoder(
            vocab_size=cfg.vocab_size, dim=cfg.decoder_dim,
            heads=cfg.decoder_heads, ffn_dim=cfg.decoder_ffn_dim,
            layers=cfg.decoder_layers)

    def init(self, rng: jax.Array, video, frames_mask):
        r1, r2 = jax.random.split(rng)
        enc_vars = self.encoder.init({"params": r1, "dropout": r1},
                                     video, frames_mask, train=False)
        enc_out = self.encoder.apply(enc_vars, video, frames_mask, train=False)
        if enc_out.shape[-1] != self.cfg.decoder_dim:
            # fairseq AVHubertSeq2Seq ties decoder input to encoder width via
            # the cross-attn k/v projections; our decoder projects from the
            # sequence it is given, so bridge with a fixed linear (converted
            # checkpoints carry it as decoder.{k,v}_proj weight shapes)
            raise ValueError("decoder_dim must equal encoder_dim in this build")
        dec_vars = self.decoder.init(r2, jnp.zeros((video.shape[0], 1), jnp.int32),
                                     enc_out, frames_mask)
        return {"encoder": enc_vars, "decoder": dec_vars}

    def encode(self, variables, video, frames_mask):
        return self.encoder.apply(variables["encoder"], video, frames_mask,
                                  train=False)

    def decode_beam(self, variables, video, frames_mask, beam: int = 10,
                    max_len: int = 50, len_penalty: float = 1.0,
                    no_repeat_ngram_size: int = 0,
                    lm=None, lm_variables=None, lm_weight: float = 0.0):
        """video -> list of token-id hypotheses (best-first per batch row).

        lm/lm_variables/lm_weight add shallow fusion (score = log p_am +
        lm_weight * log p_lm), the RAVEn eval harness's LM integration."""
        cfg = self.cfg
        enc = self.encode(variables, video, frames_mask)
        b = enc.shape[0]
        enc_rep = jnp.repeat(enc, beam, axis=0)
        mask_rep = jnp.repeat(frames_mask, beam, axis=0)
        dec_vars = variables["decoder"]
        decoder = self.decoder

        def score_prefix(tokens, step):
            logits = decoder.apply(dec_vars, tokens, enc_rep, mask_rep)
            return logits[:, step]

        if lm is not None and lm_weight:
            from lip2speech_tpu.models.lm import fuse_with_lm

            score_prefix = fuse_with_lm(score_prefix, lm, lm_variables,
                                        lm_weight)

        tokens, scores = beam_search(score_prefix, b, beam, max_len,
                                     bos=cfg.bos, eos=cfg.eos, pad=cfg.pad,
                                     unk=cfg.unk, len_penalty=len_penalty,
                                     no_repeat_ngram_size=no_repeat_ngram_size)
        tokens = np.asarray(tokens)
        return [[strip_sequence(tokens[i, k], cfg.bos, cfg.eos)
                 for k in range(beam)] for i in range(b)], np.asarray(scores)
