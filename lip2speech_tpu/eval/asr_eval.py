"""Stand-alone lipreading ASR evaluation (the RAVEn test harness equivalent).

Rebuild of reference raven/{test.py,finetune_learner.py,metrics.py}: run a
seq2seq lipreading model (AVHubertSeq2Seq or any encoder+decoder pair) with
jitted beam search (+ optional shallow-fusion LM) over a manifest and report
corpus WER.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from lip2speech_tpu.data.stage1 import Stage1Dataset
from lip2speech_tpu.data.text import SentenceProcessor
from lip2speech_tpu.eval.metrics import corpus_wer


@dataclass
class ASREvalResult:
    wer: float
    n_utts: int
    hypotheses: dict


def evaluate_asr(
    model,                       # AVHubertSeq2Seq-like: decode_beam(vars, v, m, ...)
    variables: dict,
    tsv_path: str | Path,
    transcripts: dict[str, str],
    processor: SentenceProcessor | None = None,
    root_override=None,
    beam: int = 10,
    max_len: int = 50,
    lm=None,
    lm_variables=None,
    lm_weight: float = 0.0,
    ctc_weight: float = 0.0,
    batch_size: int = 1,
) -> ASREvalResult:
    import jax.numpy as jnp

    processor = processor or SentenceProcessor()
    ds = Stage1Dataset(tsv_path, root_override=root_override, train=False)
    refs, hyps, per_utt = [], [], {}
    lm_kw = ({"lm": lm, "lm_variables": lm_variables, "lm_weight": lm_weight}
             if lm is not None and lm_weight > 0 else {})
    for batch in ds.batches(batch_size):
        video = jnp.asarray(batch["video"])
        mask = jnp.asarray(batch["frames_mask"])
        if ctc_weight > 0 and hasattr(model, "decode_joint"):
            # hybrid CTC/attention (the reference's actual RAVEn eval path,
            # raven/_espnet/nets/beam_search.py)
            nbest, _ = model.decode_joint(variables, video, mask, beam=beam,
                                          max_len=max_len,
                                          ctc_weight=ctc_weight, **lm_kw)
        else:
            nbest, _ = model.decode_beam(variables, video, mask, beam=beam,
                                         max_len=max_len, **lm_kw)
        to_text = getattr(model, "to_text_ids", lambda h: h)
        for uid, hyp_rows in zip(batch["ids"], nbest):
            if uid not in transcripts:
                continue
            text = processor.decode([t for t in to_text(hyp_rows[0])
                                     if t < processor.num_classes])
            refs.append(transcripts[uid])
            hyps.append(text)
            per_utt[uid] = text
    wer = corpus_wer(refs, hyps) if refs else 1.0
    return ASREvalResult(wer=wer, n_utts=len(refs), hypotheses=per_utt)
