"""Build a tiny, fully-local Whisper checkpoint for in-image ASR-path tests.

The reference's evaluation triple is STOI/ESTOI/PESQ + Whisper-WER + viseme
distance (test_compare.py:14-130). Published Whisper weights are not in this
zero-egress image, so `eval/asr.py` could never execute here — but nothing in
the *code path* (feature extraction -> generate -> decode -> WER/viseme)
needs pretrained weights. This helper constructs a complete random-weight
Whisper checkpoint from scratch on disk — byte-level tokenizer files
synthesized locally, multilingual generation config with lang_to_id/task_to_id
wired to hand-placed special tokens — so the full transformers load-and-
transcribe path runs in-image. Transcripts are garbage (random weights); the
tests assert plumbing + metric semantics, not WER quality.
"""

from __future__ import annotations

import json
import os


def build_tiny_whisper(dirpath: str) -> str:
    """Create a loadable tiny Whisper checkpoint under `dirpath`.

    Returns `dirpath`. Requires `transformers` (in-image); raises ImportError
    otherwise so callers can skip.
    """
    from transformers import (
        GenerationConfig,
        WhisperConfig,
        WhisperFeatureExtractor,
        WhisperForConditionalGeneration,
        WhisperProcessor,
        WhisperTokenizer,
    )
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    os.makedirs(dirpath, exist_ok=True)

    # Byte-level alphabet (GPT2 byte encoder — what Whisper's BPE is built on)
    # plus the Whisper control tokens, no merges: every byte is its own token.
    specials = [
        "<|endoftext|>", "<|startoftranscript|>", "<|en|>", "<|transcribe|>",
        "<|translate|>", "<|notimestamps|>", "<|nospeech|>",
    ]
    byte_tokens = list(bytes_to_unicode().values())
    vocab = {t: i for i, t in enumerate(byte_tokens + specials)}
    with open(os.path.join(dirpath, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(dirpath, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")

    tok = WhisperTokenizer(
        os.path.join(dirpath, "vocab.json"), os.path.join(dirpath, "merges.txt"))
    tok.add_special_tokens({"additional_special_tokens": specials})
    processor = WhisperProcessor(
        feature_extractor=WhisperFeatureExtractor(feature_size=80), tokenizer=tok)

    eot = vocab["<|endoftext|>"]
    cfg = WhisperConfig(
        vocab_size=len(tok), num_mel_bins=80,
        encoder_layers=2, encoder_attention_heads=2, encoder_ffn_dim=64,
        decoder_layers=2, decoder_attention_heads=2, decoder_ffn_dim=64,
        d_model=32, max_source_positions=1500, max_target_positions=448,
        bos_token_id=eot, eos_token_id=eot, pad_token_id=eot,
        decoder_start_token_id=vocab["<|startoftranscript|>"],
    )
    model = WhisperForConditionalGeneration(cfg)
    model.save_pretrained(dirpath)
    processor.save_pretrained(dirpath)

    # Multilingual generation config. Written last: save_pretrained emits a
    # `_from_model_config` generation config that generate() would silently
    # rebuild from the model config, dropping lang_to_id/task_to_id.
    gen = GenerationConfig(
        bos_token_id=eot, eos_token_id=eot, pad_token_id=eot,
        decoder_start_token_id=vocab["<|startoftranscript|>"],
        max_length=20, suppress_tokens=[], begin_suppress_tokens=[],
    )
    gen.is_multilingual = True
    gen.lang_to_id = {"<|en|>": vocab["<|en|>"]}
    gen.task_to_id = {"transcribe": vocab["<|transcribe|>"],
                      "translate": vocab["<|translate|>"]}
    gen.no_timestamps_token_id = vocab["<|notimestamps|>"]
    gen.save_pretrained(dirpath)
    return dirpath
