"""Stage-1 dataset: mouth video + speaker embedding -> units + mel targets.

Replaces reference multi_target_lip2speech/dataset.py:37-257 (which extends
avhubert/hubert_dataset.py). Host-side numpy; batches are padded to static
bucket lengths so every bucket compiles exactly once on TPU.

Batch dict (all np arrays):
  video:        (B, T, 88, 88, 1) float32, normalized
  frames_mask:  (B, T) bool
  spk_emb:      (B, 256) float32
  unit_tokens:  (B, 2T + 1) int32 — unit ids + num_special, EOS appended,
                PAD-filled (fairseq LabelEncoderUnit semantics, task.py:38-116)
  mel:          (B, 4T, 80) float32 — Tacotron-style dataset mel
  ids:          list[str]
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from lip2speech_tpu.core.config import UnitConfig
from lip2speech_tpu.data.manifest import Utterance, read_manifest, units_to_tokens
from lip2speech_tpu.data.transforms import prepare_video
from lip2speech_tpu.data.video_io import load_video_gray

DEFAULT_BUCKETS = (48, 96, 160, 240, 360, 480, 600)


def pick_bucket(n_frames: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n_frames <= b:
            return b
    return buckets[-1]


@dataclass
class Stage1Sample:
    uid: str
    video: np.ndarray       # (T, 88, 88) float32 normalized
    spk_emb: np.ndarray     # (256,)
    units: np.ndarray | None
    mel: np.ndarray | None  # (Tm, 80)


class Stage1Dataset:
    def __init__(
        self,
        tsv_path: str | Path,
        unt_path: str | Path | None = None,
        root_override: str | Path | None = None,
        train: bool = False,
        crop_size: int = 88,
        max_frames: int = 600,
        random_erase: bool = False,
        time_mask: bool = False,
        seed: int = 0,
        units_cfg: UnitConfig = UnitConfig(),
        emit_uint8: bool = False,
    ):
        self.utts = read_manifest(tsv_path, unt_path, root_override)
        self.train = train
        self.crop_size = crop_size
        self.max_frames = max_frames
        self.random_erase = random_erase
        self.time_mask = time_mask
        self.units_cfg = units_cfg
        self.emit_uint8 = emit_uint8
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.utts)

    def load(self, idx: int) -> Stage1Sample:
        utt = self.utts[idx]
        frames = load_video_gray(utt.video_path)[: self.max_frames]
        video = prepare_video(frames, self.crop_size, self.train, self.rng,
                              self.random_erase, self.time_mask,
                              emit_uint8=self.emit_uint8)
        spk = np.load(utt.spk_emb_path).astype(np.float32)
        mel = None
        if utt.mel_path.exists():
            mel = np.load(utt.mel_path).astype(np.float32)
        units = utt.units
        return Stage1Sample(utt.uid, video, spk, units, mel)

    def collate(self, samples: list[Stage1Sample], pad_to: int | None = None) -> dict:
        cfg = self.units_cfg
        max_t = max(s.video.shape[0] for s in samples)
        t = pad_to if pad_to is not None else pick_bucket(max_t)
        t = max(t, max_t)
        b = len(samples)
        size = samples[0].video.shape[1]

        if self.emit_uint8:
            # uint8 wire format; pad with the pixel closest to normalized 0
            from lip2speech_tpu.data.transforms import UINT8_FILL

            video = np.full((b, t, size, size, 1), UINT8_FILL, np.uint8)
        else:
            video = np.zeros((b, t, size, size, 1), np.float32)
        mask = np.zeros((b, t), bool)
        spk = np.zeros((b, 256), np.float32)
        units = np.full((b, cfg.units_per_frame * t + 1), cfg.pad, np.int32)
        mel = np.zeros((b, cfg.mel_per_frame * t, 80), np.float32)
        ids = []

        for i, s in enumerate(samples):
            n = s.video.shape[0]
            video[i, :n, :, :, 0] = s.video
            mask[i, :n] = True
            spk[i] = s.spk_emb
            ids.append(s.uid)
            if s.units is not None:
                toks = units_to_tokens(s.units[: cfg.units_per_frame * n], cfg)
                units[i, : len(toks)] = toks
            if s.mel is not None:
                m = s.mel[: cfg.mel_per_frame * n]
                mel[i, : len(m)] = m

        return {"video": video, "frames_mask": mask, "spk_emb": spk,
                "unit_tokens": units, "mel": mel, "ids": ids}

    def batches(self, batch_size: int | None = None, shuffle: bool = False,
                frames_budget: int | None = None):
        """Yield collated batches grouped by length bucket.

        With shuffle, samples are shuffled within buckets AND the batch order
        is shuffled across buckets (so training doesn't see ascending-length
        curricula); without, deterministic bucket-sorted order for eval.

        frames_budget enables by-frame-count batching (the RAVEn
        ByFrameCountSampler / fairseq max-tokens policy,
        raven/data/samplers.py): each bucket's batch size becomes
        max(1, frames_budget // bucket_len), so short-clip buckets pack more
        clips per step at the same padded-token cost. Shapes stay static per
        bucket — still exactly one XLA compile per bucket."""
        if (batch_size is None) == (frames_budget is None):
            raise ValueError("pass exactly one of batch_size / frames_budget")
        order = np.arange(len(self.utts))
        if shuffle:
            self.rng.shuffle(order)
        by_bucket: dict[int, list[int]] = {}
        for idx in order:
            bkt = pick_bucket(min(self.utts[idx].n_frames, self.max_frames))
            by_bucket.setdefault(bkt, []).append(int(idx))

        def _bs(bkt: int) -> int:
            if frames_budget is not None:
                return max(1, frames_budget // bkt)
            return batch_size

        plan = [(bkt, idxs[i : i + _bs(bkt)])
                for bkt, idxs in sorted(by_bucket.items())
                for i in range(0, len(idxs), _bs(bkt))]
        if shuffle:
            self.rng.shuffle(plan)
        for bkt, chunk in plan:
            yield self.collate([self.load(j) for j in chunk], pad_to=bkt)
