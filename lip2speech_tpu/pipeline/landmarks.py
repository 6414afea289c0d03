"""Facial-landmark providers (host side, pluggable).

The reference runs a Dockerized dlib CNN/HOG landmark server fed over Redis
(face_landmarks_server.py:55-347, detection every 2nd frame with a 1.3x
pre-crop around the previous face, <= 500 px downscale, HOG fallback). dlib
is not in this image, so the detector is a pluggable protocol; the crop
GEOMETRY (what the models actually depend on) lives in pipeline/mouth_crop.py.

Providers:
  PrecomputedLandmarks — .npy/.pkl files of (T, 68, 2) per clip (the format
    the reference's preparation pipeline also writes)
  DlibLandmarks        — wraps dlib when installed, with the reference's
    every-nth-frame + interpolation policy
"""

from __future__ import annotations

from pathlib import Path
from typing import Protocol

import numpy as np

DETECTION_NTH_FRAME = 2   # reference config.py:64
PRE_CROP_SCALE = 1.3      # reference config.py:65


class LandmarkProvider(Protocol):
    def __call__(self, frames: np.ndarray) -> list[np.ndarray | None]:
        """(T, H, W[, C]) frames -> per-frame (68, 2) landmarks or None."""
        ...


class PrecomputedLandmarks:
    """Loads landmarks stored next to (or mirroring) the video tree."""

    def __init__(self, path: str | Path):
        self.path = Path(path)

    def load(self) -> list[np.ndarray | None]:
        if self.path.suffix == ".npy":
            arr = np.load(self.path, allow_pickle=True)
            return [None if lm is None else np.asarray(lm, np.float64)
                    for lm in arr]
        if self.path.suffix == ".pkl":
            import pickle

            with open(self.path, "rb") as f:
                return pickle.load(f)
        raise ValueError(f"unsupported landmark file {self.path}")

    def __call__(self, frames: np.ndarray) -> list[np.ndarray | None]:
        lms = self.load()
        if len(lms) != len(frames):
            raise ValueError(f"{len(lms)} landmark rows vs {len(frames)} frames")
        return lms


class DlibLandmarks:
    """dlib-backed detector with the reference's nth-frame policy. Requires
    dlib + a 68-pt shape predictor; raises ImportError when unavailable."""

    def __init__(self, predictor_path: str, use_cnn: bool = False,
                 cnn_model_path: str | None = None,
                 nth_frame: int = DETECTION_NTH_FRAME):
        import dlib  # optional

        self.detector = (dlib.cnn_face_detection_model_v1(cnn_model_path)
                         if use_cnn else dlib.get_frontal_face_detector())
        self.use_cnn = use_cnn
        self.predictor = dlib.shape_predictor(predictor_path)
        self.nth_frame = nth_frame

    def _detect(self, frame: np.ndarray):
        dets = self.detector(frame, 1)
        if not dets:
            return None
        d = dets[0]
        return d.rect if self.use_cnn else d

    def __call__(self, frames: np.ndarray) -> list[np.ndarray | None]:
        out: list[np.ndarray | None] = []
        rect = None
        for i, frame in enumerate(frames):
            if i % self.nth_frame == 0 or rect is None:
                rect = self._detect(frame)
            if rect is None:
                out.append(None)
                continue
            shape = self.predictor(frame, rect)
            out.append(np.array([[p.x, p.y] for p in shape.parts()], np.float64))
        return out


def extract_mouth_video(frames: np.ndarray, provider: LandmarkProvider,
                        mean_face: np.ndarray | None = None) -> np.ndarray:
    """frames + provider -> (T, 96, 96) mouth ROI; drops nothing (undetected
    frames are interpolated like the reference preparation pipeline)."""
    from lip2speech_tpu.pipeline.mouth_crop import (
        crop_mouth_sequence, default_mean_face)

    landmarks = provider(frames)
    return crop_mouth_sequence(
        frames, landmarks,
        mean_face if mean_face is not None else default_mean_face())
