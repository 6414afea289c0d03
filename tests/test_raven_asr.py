"""RavenASR model: joint CTC/attention decode e2e + eval-harness wiring."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lip2speech_tpu.models.raven_asr import RavenASR, RavenASRConfig  # noqa: E402


def _tiny():
    return RavenASRConfig(vocab_size=12, dim=32, heads=2, ffn_dim=64,
                          layers=1, decoder_layers=1, decoder_heads=2)


def test_decode_joint_shapes_and_validity():
    cfg = _tiny()
    model = RavenASR(cfg)
    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, 8, 88, 88, 1)).astype(np.float32)
    mask = np.ones((2, 8), bool)
    mask[1, 6:] = False
    variables = model.init(jax.random.PRNGKey(0), video, mask)

    nbest, scores = model.decode_joint(variables, video, mask, beam=3,
                                       max_len=6, ctc_weight=0.3)
    assert len(nbest) == 2 and len(nbest[0]) == 3
    assert scores.shape == (2, 3)
    # best-first ordering and legal tokens only
    assert np.all(np.diff(scores, axis=1) <= 1e-6)
    for hyps in nbest:
        for h in hyps:
            assert all(cfg.unk < t < cfg.eos for t in h)


def test_lm_fusion_changes_joint_result_scores():
    from lip2speech_tpu.models.lm import TransformerLM

    cfg = _tiny()
    model = RavenASR(cfg)
    rng = np.random.default_rng(1)
    video = rng.standard_normal((1, 8, 88, 88, 1)).astype(np.float32)
    mask = np.ones((1, 8), bool)
    variables = model.init(jax.random.PRNGKey(1), video, mask)

    lm = TransformerLM(vocab_size=cfg.vocab_size, dim=16, heads=2,
                       ffn_dim=32, layers=1)
    lm_vars = lm.init(jax.random.PRNGKey(2),
                      np.zeros((1, 4), np.int32))
    _, s0 = model.decode_joint(variables, video, mask, beam=2, max_len=5,
                               ctc_weight=0.2)
    _, s1 = model.decode_joint(variables, video, mask, beam=2, max_len=5,
                               ctc_weight=0.2, lm=lm, lm_variables=lm_vars,
                               lm_weight=0.5)
    assert not np.allclose(s0, s1)


def test_evaluate_asr_joint_path(tmp_path):
    from lip2speech_tpu.data.manifest import Utterance, write_manifest
    from lip2speech_tpu.data.video_io import save_video_gray
    from lip2speech_tpu.eval.asr_eval import evaluate_asr

    rng = np.random.default_rng(2)
    root = tmp_path / "asr"
    utts, transcripts = [], {}
    for i in range(2):
        uid = f"test/c/{i:05d}"
        frames = rng.integers(0, 256, (8, 96, 96), dtype=np.uint8)
        save_video_gray(root / "video" / f"{uid}.mp4", frames)
        p = root / "spk_emb" / f"{uid}.npy"
        p.parent.mkdir(parents=True, exist_ok=True)
        np.save(p, np.zeros(256, np.float32))
        utts.append(Utterance(uid, f"video/{uid}.mp4", f"audio/{uid}.wav",
                              8, 5120))
        transcripts[uid] = "hi"
    write_manifest(root / "label/test.tsv", root, utts)

    cfg = _tiny()
    model = RavenASR(cfg)
    video = rng.standard_normal((1, 8, 88, 88, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(3), video,
                           np.ones((1, 8), bool))
    res = evaluate_asr(model, variables, root / "label/test.tsv", transcripts,
                       beam=2, max_len=5, ctc_weight=0.3)
    assert res.n_utts == 2 and res.wer >= 0.0


def test_token_mapping_roundtrip():
    from lip2speech_tpu.models.raven_asr import RavenASR

    cfg = RavenASR.from_num_classes(10, dim=32, heads=2, ffn_dim=64,
                                    layers=1, decoder_layers=1,
                                    decoder_heads=2)
    assert cfg.vocab_size == 12 and cfg.eos == 11 and cfg.blank == 0
    model = RavenASR(cfg)
    # model-space hyp [blank, piece0+1, piece9+1, eos] -> processor ids
    assert model.to_text_ids([0, 1, 10, 11]) == [0, 9]
