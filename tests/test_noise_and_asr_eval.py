"""Noise mixing SNR correctness + ASR eval harness smoke test."""

import numpy as np

import jax

from lip2speech_tpu.data.transforms import mix_noise


def test_mix_noise_snr():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(16000).astype(np.float32)
    noise = rng.standard_normal(4000).astype(np.float32)  # shorter: tiled
    for snr in [0.0, 10.0]:
        mixed = mix_noise(wav, noise, snr, np.random.default_rng(1))
        added = mixed - wav
        measured = 10 * np.log10(np.mean(wav**2) / np.mean(added**2))
        np.testing.assert_allclose(measured, snr, atol=0.2)
    assert mixed.dtype == np.float32


def test_asr_eval_harness(tmp_path, lrs3_sample_dir):
    """Tiny seq2seq over synthetic sidecar videos; WER in [0, +inf)."""
    from lip2speech_tpu.data.manifest import Utterance, read_manifest, write_manifest
    from lip2speech_tpu.data.video_io import save_video_gray
    from lip2speech_tpu.eval.asr_eval import evaluate_asr
    from lip2speech_tpu.models.avhubert_asr import AVHubertSeq2Seq, Seq2SeqConfig

    rng = np.random.default_rng(2)
    root = tmp_path / "asr"
    utts = []
    transcripts = {}
    for i in range(2):
        uid = f"test/c/{i:05d}"
        frames = rng.integers(0, 256, (8, 96, 96), dtype=np.uint8)
        save_video_gray(root / "video" / f"{uid}.mp4", frames)
        # spk_emb tree expected by the dataset
        p = root / "spk_emb" / f"{uid}.npy"
        p.parent.mkdir(parents=True, exist_ok=True)
        np.save(p, np.zeros(256, np.float32))
        utts.append(Utterance(uid, f"video/{uid}.mp4", f"audio/{uid}.wav", 8, 5120))
        transcripts[uid] = "hello there"
    write_manifest(root / "label/test.tsv", root, utts)

    cfg = Seq2SeqConfig(vocab_size=39, encoder_dim=32, encoder_heads=2,
                        encoder_ffn_dim=64, encoder_layers=1,
                        decoder_dim=32, decoder_heads=2, decoder_ffn_dim=64,
                        decoder_layers=1)
    model = AVHubertSeq2Seq(cfg)
    video = rng.standard_normal((1, 8, 88, 88, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), video, np.ones((1, 8), bool))

    res = evaluate_asr(model, variables, root / "label/test.tsv", transcripts,
                       beam=2, max_len=6)
    assert res.n_utts == 2
    assert res.wer >= 0.0
    assert set(res.hypotheses) == set(transcripts)
