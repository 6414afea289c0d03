"""RAVEn fine-tuned lipreading ASR: frontend + encoder + CTC head + decoder.

Rebuild of the reference's RAVEn fine-tune/eval model (raven/ — the
fine-tuned encoder feeds both a CTC projection and a transformer decoder,
and test-time decoding is hybrid CTC/attention with optional LM shallow
fusion via raven/_espnet/nets/beam_search.py). The encoder is our
ConformerEncoder with the RAVEn flags (layerscale, drop-path, BN-FFN
pre-norm, no macaron/conv — models/multi_target.py:115-123 uses the same),
the decoder is the shared TransformerDecoder, and decoding runs the jitted
joint beam (decode/ctc_joint.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.decode.beam import strip_sequence
from lip2speech_tpu.decode.ctc_joint import joint_beam_search
from lip2speech_tpu.models.conformer import ConformerEncoder
from lip2speech_tpu.models.resnet3d import ResNet3DFrontend
from lip2speech_tpu.models.transformer_decoder import TransformerDecoder

import flax.linen as nn

from lip2speech_tpu.models.layers import Linear


@dataclass
class RavenASRConfig:
    """espnet token layout: model id 0 = <blank>, ids 1..vocab_size-2 are
    the text-processor's tokens SHIFTED BY +1, id vocab_size-1 = <sos/eos>.
    `from_num_classes(nc)` builds the config for an nc-token processor;
    `to_text_ids` undoes the shift when decoding hypotheses."""

    vocab_size: int = 1000
    dim: int = 768
    heads: int = 12
    ffn_dim: int = 3072
    layers: int = 12
    decoder_layers: int = 6
    decoder_heads: int = 4
    blank: int = 0
    # espnet has no pad/unk at the model level; blank doubles as the token
    # -buffer filler and both are banned in the beam (the ban set is {0})
    unk: int = 0
    pad: int = 0
    @property
    def bos(self) -> int:
        return self.vocab_size - 1
    @property
    def eos(self) -> int:
        return self.vocab_size - 1


class _RavenEncoderCTC(nn.Module):
    """Video -> (encoder states, CTC log-probs)."""

    cfg: RavenASRConfig

    @nn.compact
    def __call__(self, video, frames_mask, train: bool = False):
        c = self.cfg
        x = ResNet3DFrontend(relu_type="swish", name="frontend")(video, train)
        enc, _ = ConformerEncoder(
            dim=c.dim, heads=c.heads, ffn_dim=c.ffn_dim, layers=c.layers,
            macaron=False, use_conv=False, layerscale=True, drop_path=0.1,
            ff_bn_pre=True, name="encoder")(x, frames_mask, train=train)
        ctc_logp = jax.nn.log_softmax(
            Linear(c.vocab_size, name="ctc_proj")(enc), axis=-1)
        return enc, ctc_logp


class RavenASR:
    """Bundles the encoder tower and decoder with init/decode helpers."""

    def __init__(self, cfg: RavenASRConfig):
        self.cfg = cfg
        self.encoder = _RavenEncoderCTC(cfg)
        self.decoder = TransformerDecoder(
            vocab_size=cfg.vocab_size, dim=cfg.dim, heads=cfg.decoder_heads,
            ffn_dim=cfg.ffn_dim, layers=cfg.decoder_layers)

    def init(self, rng: jax.Array, video, frames_mask):
        r1, r2 = jax.random.split(rng)
        enc_vars = self.encoder.init(
            {"params": r1, "dropout": r1}, video, frames_mask, train=False)
        enc, _ = self.encoder.apply(enc_vars, video, frames_mask, train=False)
        dec_vars = self.decoder.init(
            r2, jnp.zeros((video.shape[0], 1), jnp.int32), enc, frames_mask)
        return {"encoder": enc_vars, "decoder": dec_vars}

    @staticmethod
    def from_num_classes(num_classes: int, **kw) -> "RavenASRConfig":
        """Config for an `num_classes`-token text processor (+blank, +eos)."""
        return RavenASRConfig(vocab_size=num_classes + 2, **kw)

    def to_text_ids(self, hyp: list[int]) -> list[int]:
        """Model-space hypothesis -> text-processor token ids (-1 shift,
        specials dropped)."""
        return [t - 1 for t in hyp if 1 <= t <= self.cfg.vocab_size - 2]

    def decode_joint(self, variables, video, frames_mask, beam: int = 10,
                     max_len: int = 50, ctc_weight: float = 0.1,
                     lm=None, lm_variables=None, lm_weight: float = 0.0,
                     pre_beam: int = 0, len_penalty: float = 0.0,
                     parallel_time: bool | None = None):
        """Hybrid CTC/attention beam decode -> n-best token lists.

        parallel_time=None auto-selects the O(log T) associative-scan CTC
        recursion on TPU (decode/ctc_joint.py) and the sequential scan
        elsewhere."""
        cfg = self.cfg
        if parallel_time is None:
            parallel_time = jax.default_backend() == "tpu"
        enc, ctc_logp = self.encoder.apply(
            variables["encoder"], video, frames_mask, train=False)
        b = enc.shape[0]
        lengths = frames_mask.sum(axis=1).astype(jnp.int32)
        enc_rep = jnp.repeat(enc, beam, axis=0)
        mask_rep = jnp.repeat(frames_mask, beam, axis=0)
        dec_vars = variables["decoder"]
        decoder = self.decoder

        def att_score(tokens, step):
            return decoder.apply(dec_vars, tokens, enc_rep, mask_rep)[:, step]

        lm_score = None
        if lm is not None and lm_weight:
            def lm_score(tokens, step):   # noqa: F811
                return lm.apply(lm_variables, tokens)[:, step]

        tokens, scores = joint_beam_search(
            att_score, ctc_logp, lengths, batch_size=b, beam=beam,
            max_len=max_len, ctc_weight=ctc_weight,
            lm_score_prefix=lm_score, lm_weight=lm_weight,
            bos=cfg.bos, eos=cfg.eos, pad=cfg.pad, unk=cfg.unk,
            blank=cfg.blank, pre_beam=pre_beam, len_penalty=len_penalty,
            parallel_time=parallel_time)
        tokens = np.asarray(tokens)
        return [[strip_sequence(tokens[i, k], cfg.bos, cfg.eos)
                 for k in range(beam)] for i in range(b)], np.asarray(scores)

    # evaluate_asr compatibility (attention-only fallback)
    def decode_beam(self, variables, video, frames_mask, **kw):
        return self.decode_joint(variables, video, frames_mask,
                                 ctc_weight=0.0, **kw)
