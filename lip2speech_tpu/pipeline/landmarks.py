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
  HeuristicLandmarks   — in-image-runnable (no dlib): local-variance face
    box + canonical mean-shape placement + gradient mouth refinement. The
    crop geometry consumes only the stable points and the mouth-region
    center, so a box-aligned mean shape reproduces the reference's 96x96
    mouth ROI for roughly frontal faces.
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

        if not hasattr(dlib, "get_frontal_face_detector"):
            # a bare dlib/ directory on sys.path imports as an empty
            # namespace package — treat as unavailable
            raise ImportError("dlib namespace package has no detector API")
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


def detect_face_box(gray: np.ndarray, min_rel_size: float = 0.15):
    """Face bounding box from a local-variance saliency map.

    Faces are the high-texture blob in a talking-head frame (the serving
    envelope: <= 480x360 close-ups, reference config.py:20-30). Local std is
    computed with box filters, thresholded, and the box taken from weighted
    coordinate quantiles — robust to plain/gradient backgrounds, no dlib.
    Returns (x0, y0, x1, y1) or None.
    """
    from scipy.ndimage import uniform_filter

    g = gray.astype(np.float64)
    if g.ndim == 3:
        g = g.mean(axis=-1)
    h, w = g.shape
    k = max(5, min(h, w) // 10)
    mean = uniform_filter(g, k)
    var = np.clip(uniform_filter(g * g, k) - mean * mean, 0.0, None)
    sal = np.sqrt(var)
    peak = sal.max()
    if peak <= 1e-6:
        return None
    wgt = np.where(sal > 0.3 * peak, sal, 0.0)
    total = wgt.sum()
    if total <= 0:
        return None

    def _span(axis):
        p = wgt.sum(axis=axis)
        c = np.cumsum(p) / p.sum()
        lo = int(np.searchsorted(c, 0.02))
        hi = int(np.searchsorted(c, 0.98))
        return lo, hi + 1

    x0, x1 = _span(0)
    y0, y1 = _span(1)
    if (x1 - x0) < min_rel_size * w or (y1 - y0) < min_rel_size * h:
        return None
    return (x0, y0, x1, y1)


class HeuristicLandmarks:
    """Landmark estimator that runs in this image (dlib-free raw-video path).

    Per the reference's detection policy (face_landmarks_server.py:55-347 +
    config.py:64): detect on every `nth_frame`, reuse the previous box in
    between. Landmarks are the canonical 68-pt mean shape
    (mouth_crop.default_mean_face) scaled into the detected box, with the
    mouth points (48-67) re-centered on the strongest horizontal-gradient
    band in the lower half of the box (lips are the highest-contrast
    horizontal structure there).
    """

    def __init__(self, nth_frame: int = DETECTION_NTH_FRAME,
                 refine_mouth: bool = True):
        self.nth_frame = nth_frame
        self.refine_mouth = refine_mouth

    def _place_shape(self, box, frame: np.ndarray) -> np.ndarray:
        from lip2speech_tpu.pipeline.mouth_crop import default_mean_face

        canon = default_mean_face()
        cmin, cmax = canon.min(axis=0), canon.max(axis=0)
        x0, y0, x1, y1 = box
        scale = np.array([(x1 - x0) / (cmax[0] - cmin[0]),
                          (y1 - y0) / (cmax[1] - cmin[1])])
        pts = (canon - cmin) * scale + np.array([x0, y0], np.float64)
        if self.refine_mouth:
            c = self._mouth_center(frame, box)
            if c is not None:
                pts[48:68] += c - pts[48:68].mean(axis=0)
        return pts

    @staticmethod
    def _mouth_center(frame: np.ndarray, box) -> np.ndarray | None:
        g = frame.astype(np.float64)
        if g.ndim == 3:
            g = g.mean(axis=-1)
        x0, y0, x1, y1 = box
        bh, bw = y1 - y0, x1 - x0
        ry0, ry1 = y0 + int(0.55 * bh), y0 + int(0.95 * bh)
        rx0, rx1 = x0 + int(0.25 * bw), x0 + int(0.75 * bw)
        region = g[ry0:ry1, rx0:rx1]
        if region.shape[0] < 3 or region.shape[1] < 3:
            return None
        grad = np.abs(np.diff(region, axis=0))
        row_e = grad.sum(axis=1)
        if row_e.sum() <= 1e-9:
            return None
        my = ry0 + float(np.argmax(row_e)) + 0.5
        band = grad[max(0, int(np.argmax(row_e)) - 2): int(np.argmax(row_e)) + 3]
        col_e = band.sum(axis=0)
        mx = rx0 + (float((col_e * np.arange(len(col_e))).sum() / col_e.sum())
                    if col_e.sum() > 0 else 0.5 * (rx1 - rx0))
        return np.array([mx, my], np.float64)

    def __call__(self, frames: np.ndarray) -> list[np.ndarray | None]:
        out: list[np.ndarray | None] = []
        box = None
        for i, frame in enumerate(frames):
            if i % self.nth_frame == 0 or box is None:
                box = detect_face_box(frame) or box
            out.append(None if box is None else self._place_shape(box, frame))
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
