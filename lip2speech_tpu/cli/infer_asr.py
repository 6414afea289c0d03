"""Seq2seq lipreading ASR decode CLI — the avhubert infer_s2s.py equivalent.

Runs an AVHubertSeq2Seq model over a manifest with the jitted beam search
(optional repeat-ngram blocking, length penalty), writes hypo.json and a
wer file — the artifacts of reference avhubert/infer_s2s.py:50-318.

Checkpoint: an orbax directory holding the model's variables pytree
({"encoder": ..., "decoder": ...}); omit for a random-weight smoke run.
Transcripts: a JSON {uid: text}; when given, corpus WER is computed with
the same word-level Levenshtein as eval/metrics.py.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tsv", required=True)
    p.add_argument("--root", default=None)
    p.add_argument("--transcripts", default=None,
                   help="JSON {uid: reference text} for WER")
    p.add_argument("--checkpoint", default=None, help="orbax variables dir")
    p.add_argument("--vocab", default=None,
                   help=".vocab for unigram text; default char-level")
    p.add_argument("--beam", type=int, default=10)
    p.add_argument("--max-len", type=int, default=50)
    p.add_argument("--len-penalty", type=float, default=1.0)
    p.add_argument("--no-repeat-ngram", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--out-dir", required=True)
    # hybrid CTC/attention decoding (the RAVEn eval path; needs --raven)
    p.add_argument("--raven", action="store_true",
                   help="RavenASR model (encoder+CTC+decoder, joint decode)")
    p.add_argument("--ctc-weight", type=float, default=0.0,
                   help="joint CTC/attention weight (RavenASR only)")
    # LM shallow fusion
    p.add_argument("--lm-checkpoint", default=None,
                   help="orbax variables dir for a TransformerLM")
    p.add_argument("--lm-weight", type=float, default=0.0)
    p.add_argument("--lm-dim", type=int, default=512)
    p.add_argument("--lm-heads", type=int, default=8)
    p.add_argument("--lm-ffn-dim", type=int, default=2048)
    p.add_argument("--lm-layers", type=int, default=6)
    # architecture (reference AVHubertSeq2Seq large defaults)
    p.add_argument("--encoder-dim", type=int, default=1024)
    p.add_argument("--encoder-heads", type=int, default=16)
    p.add_argument("--encoder-ffn-dim", type=int, default=4096)
    p.add_argument("--encoder-layers", type=int, default=24)
    p.add_argument("--decoder-heads", type=int, default=4)
    p.add_argument("--decoder-ffn-dim", type=int, default=3072)
    p.add_argument("--decoder-layers", type=int, default=6)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lip2speech_tpu.data.stage1 import Stage1Dataset
    from lip2speech_tpu.data.text import SentenceProcessor
    from lip2speech_tpu.eval.metrics import corpus_wer
    from lip2speech_tpu.models.avhubert_asr import AVHubertSeq2Seq, Seq2SeqConfig

    processor = SentenceProcessor(args.vocab)
    if args.raven:
        from lip2speech_tpu.models.raven_asr import RavenASR

        # espnet layout: blank=0, processor ids shifted +1, sos=eos=last
        model = RavenASR(RavenASR.from_num_classes(
            processor.num_classes,
            dim=args.encoder_dim, heads=args.encoder_heads,
            ffn_dim=args.encoder_ffn_dim, layers=args.encoder_layers,
            decoder_layers=args.decoder_layers,
            decoder_heads=args.decoder_heads))
        if args.no_repeat_ngram:
            print("warning: --no-repeat-ngram is not supported by the "
                  "joint CTC/attention decoder; ignoring")
    else:
        cfg = Seq2SeqConfig(
            vocab_size=processor.num_classes,
            encoder_dim=args.encoder_dim, encoder_heads=args.encoder_heads,
            encoder_ffn_dim=args.encoder_ffn_dim, encoder_layers=args.encoder_layers,
            decoder_dim=args.encoder_dim, decoder_heads=args.decoder_heads,
            decoder_ffn_dim=args.decoder_ffn_dim, decoder_layers=args.decoder_layers)
        model = AVHubertSeq2Seq(cfg)

    lm = lm_vars = None
    if args.lm_checkpoint and args.lm_weight:
        from lip2speech_tpu.models.lm import TransformerLM
        from lip2speech_tpu.train.checkpoint import load_pytree as load_lm

        vocab = (processor.num_classes + 2 if args.raven
                 else processor.num_classes)
        lm = TransformerLM(vocab_size=vocab, dim=args.lm_dim,
                           heads=args.lm_heads, ffn_dim=args.lm_ffn_dim,
                           layers=args.lm_layers)
        lm_vars = load_lm(args.lm_checkpoint)

    ds = Stage1Dataset(args.tsv, root_override=args.root, train=False)
    if args.checkpoint:
        from lip2speech_tpu.train.checkpoint import load_pytree

        variables = load_pytree(args.checkpoint)
    else:
        # random init needs a probe batch for shapes — only draw it here
        first = next(ds.batches(args.batch_size), None)
        if first is None:
            raise SystemExit(f"empty manifest: {args.tsv}")
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.asarray(first["video"]),
                               jnp.asarray(first["frames_mask"]))

    transcripts = (json.loads(Path(args.transcripts).read_text())
                   if args.transcripts else {})
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    hypos: dict = {}
    refs, hyps = [], []
    lm_kw = ({"lm": lm, "lm_variables": lm_vars, "lm_weight": args.lm_weight}
             if lm is not None else {})
    dev_vars = jax.tree_util.tree_map(jnp.asarray, variables)
    for batch in ds.batches(args.batch_size):
        video = jnp.asarray(batch["video"])
        mask = jnp.asarray(batch["frames_mask"])
        if args.raven:
            nbest, scores = model.decode_joint(
                dev_vars, video, mask, beam=args.beam, max_len=args.max_len,
                ctc_weight=args.ctc_weight, len_penalty=args.len_penalty,
                **lm_kw)
        else:
            nbest, scores = model.decode_beam(
                dev_vars, video, mask, beam=args.beam, max_len=args.max_len,
                len_penalty=args.len_penalty,
                no_repeat_ngram_size=args.no_repeat_ngram, **lm_kw)
        for i, uid in enumerate(batch["ids"]):
            hyp = (model.to_text_ids(nbest[i][0]) if args.raven
                   else nbest[i][0])
            text = processor.decode(
                [t for t in hyp if t < processor.num_classes])
            hypos[uid] = {"hypo": text, "score": float(np.asarray(scores)[i, 0])}
            if uid in transcripts:
                hypos[uid]["ref"] = transcripts[uid]
                refs.append(transcripts[uid])
                hyps.append(text)

    (out_dir / "hypo.json").write_text(json.dumps(hypos, indent=2))
    if refs:
        wer = corpus_wer(refs, hyps)
        (out_dir / "wer.txt").write_text(
            f"WER: {100.0 * wer:.2f}\nn_utts: {len(refs)}\n")
        print(f"WER {100.0 * wer:.2f}% over {len(refs)} utts")
    print(f"wrote {out_dir / 'hypo.json'} ({len(hypos)} hypotheses)")


if __name__ == "__main__":
    main()
