"""Video IO gateway.

The training/serving videos are pre-cropped 96x96 grayscale mouth-ROI mp4s at
25 fps. mp4 decode requires an external backend; sources in priority order:

  1. a `.npy` sidecar next to the mp4 (same stem): (T, H, W) uint8 — the
     native format for this framework's own dataset builder
  2. cv2.VideoCapture (the reference's own decode path, utils_aug.py:16-35)
  3. imageio (if an ffmpeg backend is installed in the deployment env)
  4. raw `.gray` files: little-endian uint8 with a 12-byte header T,H,W int32

Grayscale conversion uses the ITU-R BT.601 luma weights — the same as the
reference's cv2.cvtColor(..., COLOR_BGR2GRAY) (utils_aug.py:16-35).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

LUMA = np.array([0.299, 0.587, 0.114], dtype=np.float32)  # RGB order


def rgb_to_gray(frames: np.ndarray) -> np.ndarray:
    """(T, H, W, 3) uint8 RGB -> (T, H, W) uint8 via BT.601 luma (cv2 rounding)."""
    gray = frames.astype(np.float32) @ LUMA
    return np.clip(np.round(gray), 0, 255).astype(np.uint8)


def _try_cv2(path: Path) -> np.ndarray | None:
    try:
        import cv2
    except ImportError:
        return None
    if not hasattr(cv2, "VideoCapture"):  # bare namespace package hazard
        return None
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        return None
    frames = []
    ok, frame = cap.read()
    while ok:
        # cv2 yields BGR; reference uses cv2.cvtColor(..., COLOR_BGR2GRAY)
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
        ok, frame = cap.read()
    cap.release()
    return np.stack(frames) if frames else None


def _try_imageio(path: Path) -> np.ndarray | None:
    try:
        import imageio.v3 as iio

        arr = iio.imread(path, plugin="pyav")  # (T, H, W, C)
    except Exception:
        try:
            import imageio

            reader = imageio.get_reader(str(path))
            arr = np.stack([f for f in reader])
        except Exception:
            return None
    if arr.ndim == 4 and arr.shape[-1] == 3:
        return rgb_to_gray(arr)
    if arr.ndim == 4 and arr.shape[-1] == 1:
        return arr[..., 0]
    return arr


def load_video_gray(path: str | Path) -> np.ndarray:
    """Load a video as (T, H, W) uint8 grayscale frames."""
    path = Path(path)
    npy = path.with_suffix(".npy")
    if npy.exists():
        arr = np.load(npy)
        if arr.ndim == 4:
            arr = rgb_to_gray(arr) if arr.shape[-1] == 3 else arr[..., 0]
        return arr.astype(np.uint8)
    if path.suffix == ".gray" and path.exists():
        raw = path.read_bytes()
        t, h, w = np.frombuffer(raw[:12], dtype="<i4")
        return np.frombuffer(raw[12:], dtype=np.uint8).reshape(t, h, w).copy()
    if path.exists():
        arr = _try_cv2(path)
        if arr is None:
            arr = _try_imageio(path)
        if arr is not None:
            return arr.astype(np.uint8)
    raise FileNotFoundError(
        f"cannot load video {path}: no .npy sidecar and no mp4 decode backend "
        f"(install imageio-ffmpeg or provide {npy})")


def save_video_gray(path: str | Path, frames: np.ndarray) -> None:
    """Save (T, H, W) uint8 frames as the .npy sidecar format."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path.with_suffix(".npy"), frames.astype(np.uint8))
