"""Data layer tests on the bundled LRS3 sample + synthetic videos."""

import numpy as np
import pytest

from lip2speech_tpu.core.config import UnitConfig, VocoderConfig
from lip2speech_tpu.data import manifest as mf
from lip2speech_tpu.data import transforms as tr
from lip2speech_tpu.data.stage1 import Stage1Dataset, pick_bucket
from lip2speech_tpu.data.stage2 import Stage2Dataset
from lip2speech_tpu.data.video_io import load_video_gray, save_video_gray


def test_read_manifest_and_units(lrs3_sample_dir):
    utts = mf.read_manifest(lrs3_sample_dir / "label/test.tsv",
                            lrs3_sample_dir / "label/test.unt",
                            root_override=lrs3_sample_dir)
    assert len(utts) == 5
    u = utts[0]
    assert u.uid == "test/UmvOgW6iV2s/00007"
    assert u.n_frames == 107
    assert u.units is not None and u.units.min() >= 0 and u.units.max() < 200
    # unit rate = 2 per video frame
    assert abs(len(u.units) - 2 * u.n_frames) <= 2
    assert u.mel_path.exists() and u.spk_emb_path.exists()


def test_units_tokens_roundtrip():
    cfg = UnitConfig()
    units = np.array([0, 5, 199], dtype=np.int32)
    toks = mf.units_to_tokens(units, cfg)
    assert toks.tolist() == [4, 9, 203, cfg.eos]
    back = mf.tokens_to_units(toks, cfg)
    assert back.tolist() == [0, 5, 199]


def test_stage2_dataset_on_bundled_data(lrs3_sample_dir):
    ds = Stage2Dataset(lrs3_sample_dir / "label/test.tsv",
                       lrs3_sample_dir / "label/test.unt",
                       root_override=lrs3_sample_dir, train=True)
    batch = ds.collate([0, 1])
    cfg = VocoderConfig()
    assert batch["audio"].shape == (2, cfg.segment_size)
    assert batch["code"].shape == (2, cfg.segment_size // cfg.code_hop_size)
    assert batch["mel"].shape == (2, cfg.segment_size // cfg.mel_hop_size, 80)
    assert batch["spk_emb"].shape == (2, 256)

    # eval mode: full-length, hop aligned
    ds_eval = Stage2Dataset(lrs3_sample_dir / "label/test.tsv",
                            lrs3_sample_dir / "label/test.unt",
                            root_override=lrs3_sample_dir, train=False)
    s = ds_eval.load(2)
    assert len(s.audio) == len(s.code) * 320
    assert len(s.mel) == len(s.code) * 2


def test_stage1_dataset_with_sidecar_videos(lrs3_sample_dir, tmp_path):
    """Synthesize .npy sidecars (96x96 uint8) mirroring the sample tree."""
    utts = mf.read_manifest(lrs3_sample_dir / "label/test.tsv",
                            lrs3_sample_dir / "label/test.unt",
                            root_override=lrs3_sample_dir)
    rng = np.random.default_rng(0)
    root = tmp_path / "lrs3"
    for u in utts:
        rel = u.video_path.relative_to(lrs3_sample_dir)
        frames = rng.integers(0, 256, (u.n_frames, 96, 96), dtype=np.uint8)
        save_video_gray(root / rel, frames)
        # mirror mel/spk_emb/audio trees via copies
        for src_fn in [u.mel_path, u.spk_emb_path]:
            dst = root / src_fn.relative_to(lrs3_sample_dir)
            dst.parent.mkdir(parents=True, exist_ok=True)
            np.save(dst, np.load(src_fn))
    # write manifest pointing at the mirror
    mf.write_manifest(root / "label/test.tsv", root,
                      [mf.Utterance(u.uid, u.video_path.relative_to(lrs3_sample_dir),
                                    u.audio_path.relative_to(lrs3_sample_dir),
                                    u.n_frames, u.n_samples) for u in utts])
    import shutil

    shutil.copyfile(lrs3_sample_dir / "label/test.unt", root / "label/test.unt")

    ds = Stage1Dataset(root / "label/test.tsv", root / "label/test.unt", train=False)
    batches = list(ds.batches(batch_size=3))
    assert sum(b["video"].shape[0] for b in batches) == 5
    b0 = batches[0]
    t = b0["video"].shape[1]
    assert t in (48, 96, 160)
    assert b0["video"].shape[2:] == (88, 88, 1)
    assert b0["unit_tokens"].shape == (b0["video"].shape[0], 2 * t + 1)
    assert b0["mel"].shape == (b0["video"].shape[0], 4 * t, 80)
    # mask lengths match manifest frames
    lens = b0["frames_mask"].sum(1)
    assert all(l <= t for l in lens)
    # padded unit slots are PAD
    cfg = UnitConfig()
    row = b0["unit_tokens"][0]
    n_valid = int(lens[0]) * 2 + 1
    assert (row[n_valid:] == cfg.pad).all()
    assert row[n_valid - 1] == cfg.eos


def test_transforms_shapes_and_normalization():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (30, 96, 96), dtype=np.uint8)
    out = tr.prepare_video(frames, 88, train=False)
    assert out.shape == (30, 88, 88)
    # center crop + normalize: reconstruct expected directly
    x = frames.astype(np.float32) / 255.0
    x = x[:, 4:92, 4:92]
    np.testing.assert_allclose(out, (x - 0.421) / 0.165, atol=1e-6)

    out_t = tr.prepare_video(frames, 88, train=True, rng=rng,
                             use_random_erase=True, use_time_mask=True)
    assert out_t.shape == (30, 88, 88)


def test_pick_bucket():
    assert pick_bucket(30) == 48
    assert pick_bucket(48) == 48
    assert pick_bucket(49) == 96
    assert pick_bucket(10_000) == 600


def test_video_io_roundtrip(tmp_path):
    frames = np.random.default_rng(2).integers(0, 256, (7, 12, 12), dtype=np.uint8)
    save_video_gray(tmp_path / "clip.mp4", frames)
    back = load_video_gray(tmp_path / "clip.mp4")
    np.testing.assert_array_equal(back, frames)


def test_frames_budget_batching_policy():
    """By-frame-count batching (RAVEn ByFrameCountSampler semantics): each
    bucket packs max(1, budget // bucket_len) clips, so short buckets get
    bigger batches at constant padded-token cost."""
    from lip2speech_tpu.data.stage1 import Stage1Dataset

    ds = Stage1Dataset.__new__(Stage1Dataset)
    ds.rng = np.random.default_rng(0)
    ds.max_frames = 600

    class U:  # minimal utterance stub
        def __init__(self, n):
            self.n_frames = n

    # 6 short clips (bucket 48) + 3 long ones (bucket 160)
    ds.utts = [U(30)] * 6 + [U(150)] * 3
    plans = []
    ds.load = lambda j: j
    ds.collate = lambda samples, pad_to=None: (pad_to, len(samples))
    out = list(ds.batches(frames_budget=480))
    # bucket 48 -> bs 10 (all 6 fit in one batch); bucket 160 -> bs 3
    assert (48, 6) in out and (160, 3) in out
    assert len(out) == 2

    out2 = list(ds.batches(frames_budget=100))
    # bucket 48 -> bs 2 (3 batches); bucket 160 -> bs 1 (3 batches)
    assert out2.count((48, 2)) == 3 and out2.count((160, 1)) == 3

    with pytest.raises(ValueError, match="exactly one"):
        list(ds.batches(batch_size=2, frames_budget=100))
    with pytest.raises(ValueError, match="exactly one"):
        list(ds.batches())


def test_adaptive_time_mask_semantics():
    """RAVEn AdaptiveLengthTimeMask: mean fill, bounded mask count/length."""
    from lip2speech_tpu.data.transforms import adaptive_time_mask

    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 4, 4)).astype(np.float32) + 5.0
    out = adaptive_time_mask(x, np.random.default_rng(1), window=10, stride=25)
    assert out.shape == x.shape
    changed = np.any(out != x, axis=(1, 2))
    # masked frames are set to the clip mean
    assert np.allclose(out[changed], x.mean(), atol=1e-5)
    # n_mask = ceil-ish(100/25) = 4 masks of length < 10
    assert 0 < changed.sum() <= 4 * 9
    # degenerate tiny clip: never crashes, never masks beyond bounds
    tiny = adaptive_time_mask(x[:2], np.random.default_rng(2), window=10,
                              stride=25)
    assert tiny.shape == (2, 4, 4)
