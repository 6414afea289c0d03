"""AV-HuBERT seq2seq ASR smoke test (tiny dims)."""

import numpy as np

import jax

from lip2speech_tpu.models.avhubert_asr import AVHubertSeq2Seq, Seq2SeqConfig


def test_seq2seq_decode_beam():
    cfg = Seq2SeqConfig(vocab_size=20, encoder_dim=32, encoder_heads=2,
                        encoder_ffn_dim=64, encoder_layers=1,
                        decoder_dim=32, decoder_heads=2, decoder_ffn_dim=64,
                        decoder_layers=1)
    model = AVHubertSeq2Seq(cfg)
    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, 6, 32, 32, 1)).astype(np.float32)
    mask = np.ones((2, 6), bool)
    variables = model.init(jax.random.PRNGKey(0), video, mask)

    hyps, scores = model.decode_beam(variables, video, mask, beam=4, max_len=8)
    assert len(hyps) == 2 and len(hyps[0]) == 4
    assert scores.shape == (2, 4)
    for row in hyps:
        for h in row:
            assert all(4 <= t < 20 or t == cfg.eos for t in h) or h == []
    # deterministic
    hyps2, _ = model.decode_beam(variables, video, mask, beam=4, max_len=8)
    assert hyps == hyps2
