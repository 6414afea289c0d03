"""Host media helpers: dim clamping, fps planning, ffmpeg command templates.

Pure-python rebuild of the reference's media utilities (helpers.py:26-416):
the geometry/planning logic is in-tree; actual transcodes run through ffmpeg
when present (command builders returned as argv lists).
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

MAX_W, MAX_H = 480, 360   # reference config.py DIM_1/DIM_2
FPS = 25


def get_updated_dims(width: int, height: int,
                     max_w: int = MAX_W, max_h: int = MAX_H) -> tuple[int, int]:
    """Aspect-preserving clamp to <= (max_w, max_h), even dims
    (reference helpers.py get_updated_dims semantics)."""
    if width <= max_w and height <= max_h:
        w, h = width, height
    else:
        scale = min(max_w / width, max_h / height)
        w, h = int(width * scale), int(height * scale)
    return w - (w % 2), h - (h % 2)


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def resize_cmd(src: str | Path, dst: str | Path, width: int, height: int) -> list[str]:
    return ["ffmpeg", "-y", "-i", str(src), "-vf", f"scale={width}:{height}",
            "-c:a", "copy", str(dst)]


def fps_cmd(src: str | Path, dst: str | Path, fps: int = FPS) -> list[str]:
    return ["ffmpeg", "-y", "-i", str(src), "-filter:v", f"fps={fps}",
            "-c:a", "copy", str(dst)]


def extract_audio_cmd(src: str | Path, dst: str | Path, sr: int = 16_000) -> list[str]:
    return ["ffmpeg", "-y", "-i", str(src), "-vn", "-ac", "1", "-ar", str(sr),
            "-f", "wav", str(dst)]


def concat_cmd(list_file: str | Path, dst: str | Path) -> list[str]:
    """VSG segment stitching (reference vsg_service.py ffmpeg concat)."""
    return ["ffmpeg", "-y", "-f", "concat", "-safe", "0", "-i", str(list_file),
            "-c", "copy", str(dst)]


def run(cmd: list[str]) -> bool:
    if not ffmpeg_available():
        return False
    subprocess.run(cmd, check=True, capture_output=True)
    return True
