"""Stage-2 (vocoder) dataset: units + mel + speaker + target waveform.

Replaces reference multi_input_vocoder/dataset_multi_input.py:41-295:
  * audio peak-normalized * 0.95 (librosa normalize semantics)
  * trims audio/mel/code to a common hop-aligned length
    (code hop 320 @16 kHz = 50 Hz units; mel hop 160 = 100 Hz)
  * tiles short clips to >= segment_size, then crops a random aligned
    8,960-sample (0.56 s) training segment (_sample_interval)
  * asserts |code| ~ 2x video frames (+-2 tolerance)
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from lip2speech_tpu.core.config import VocoderConfig
from lip2speech_tpu.data.manifest import read_manifest
from lip2speech_tpu.data.transforms import mel_blur_noise
from lip2speech_tpu.utils.audio_io import peak_normalize, read_wav


@dataclass
class Stage2Sample:
    uid: str
    audio: np.ndarray   # (N,) float32, hop-aligned with code/mel
    code: np.ndarray    # (N / 320,) int32
    mel: np.ndarray     # (N / 160, 80) float32
    spk_emb: np.ndarray


class Stage2Dataset:
    def __init__(
        self,
        tsv_path: str | Path,
        unt_path: str | Path,
        cfg: VocoderConfig = VocoderConfig(),
        root_override: str | Path | None = None,
        train: bool = True,
        mel_aug: bool = False,
        seed: int = 1234,
    ):
        self.utts = read_manifest(tsv_path, unt_path, root_override)
        self.cfg = cfg
        self.train = train
        self.mel_aug = mel_aug
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.utts)

    def load(self, idx: int) -> Stage2Sample:
        cfg = self.cfg
        utt = self.utts[idx]
        audio, sr = read_wav(utt.audio_path)
        if audio.ndim > 1:
            audio = audio.mean(axis=1)
        audio = peak_normalize(audio, 0.95)
        code = utt.units.astype(np.int32)
        if abs(len(code) - 2 * utt.n_frames) > 2:
            raise ValueError(
                f"{utt.uid}: |code|={len(code)} vs 2x{utt.n_frames} frames")
        mel = np.load(utt.mel_path).astype(np.float32)

        # trim to common hop-aligned length (dataset_multi_input.py:222-241)
        code_len = min(len(audio) // cfg.code_hop_size, len(code))
        mel_len = min(len(audio) // cfg.mel_hop_size, len(mel))
        cut = min(mel_len * cfg.mel_hop_size, code_len * cfg.code_hop_size)
        audio = audio[:cut]
        mel = mel[: cut // cfg.mel_hop_size]
        code = code[: cut // cfg.code_hop_size]
        return Stage2Sample(utt.uid, audio.astype(np.float32), code, mel,
                            np.load(utt.spk_emb_path).astype(np.float32))

    def _tile_to_segment(self, s: Stage2Sample) -> Stage2Sample:
        cfg = self.cfg
        while len(s.audio) < cfg.segment_size:
            s = Stage2Sample(
                s.uid,
                np.concatenate([s.audio, s.audio]),
                np.concatenate([s.code, s.code]),
                np.concatenate([s.mel, s.mel]),
                s.spk_emb,
            )
        return s

    def sample_segment(self, s: Stage2Sample) -> Stage2Sample:
        """Random aligned segment crop (_sample_interval semantics)."""
        cfg = self.cfg
        s = self._tile_to_segment(s)
        n_codes_seg = cfg.segment_size // cfg.code_hop_size     # 28
        max_start_code = len(s.code) - n_codes_seg
        start_code = int(self.rng.integers(0, max_start_code + 1))
        a0 = start_code * cfg.code_hop_size
        m0 = a0 // cfg.mel_hop_size
        audio = s.audio[a0 : a0 + cfg.segment_size]
        code = s.code[start_code : start_code + n_codes_seg]
        mel = s.mel[m0 : m0 + cfg.segment_size // cfg.mel_hop_size]
        return Stage2Sample(s.uid, audio, code, mel, s.spk_emb)

    def collate(self, idxs: list[int]) -> dict:
        cfg = self.cfg
        samples = [self.load(i) for i in idxs]
        if self.train:
            samples = [self.sample_segment(s) for s in samples]
        n = min(len(s.audio) for s in samples)
        n -= n % cfg.code_hop_size
        audio = np.stack([s.audio[:n] for s in samples])
        code = np.stack([s.code[: n // cfg.code_hop_size] for s in samples])
        mel = np.stack([s.mel[: n // cfg.mel_hop_size] for s in samples])
        if self.train and self.mel_aug:
            mel = np.stack([mel_blur_noise(m, self.rng) for m in mel])
        spk = np.stack([s.spk_emb for s in samples])
        return {"audio": audio.astype(np.float32), "code": code.astype(np.int32),
                "mel": mel.astype(np.float32), "spk_emb": spk.astype(np.float32),
                "ids": [s.uid for s in samples]}

    def batches(self, batch_size: int, shuffle: bool = True):
        order = np.arange(len(self.utts))
        if shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            yield self.collate(list(order[i : i + batch_size]))
