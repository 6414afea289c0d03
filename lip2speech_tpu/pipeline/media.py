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
    """VSG segment stitching (reference vsg_service.py ffmpeg concat /
    MERGE_VIDEOS_COMMAND, helpers.py:35)."""
    return ["ffmpeg", "-y", "-f", "concat", "-safe", "0", "-i", str(list_file),
            "-c", "copy", str(dst)]


def pad_audio_start_cmd(src: str | Path, dst: str | Path, delay_s: int) -> list[str]:
    """Prepend delay_s seconds of silence (PAD_AUDIO_START_COMMAND,
    helpers.py:32: adelay per channel in ms)."""
    ms = int(delay_s) * 1000
    return ["ffmpeg", "-y", "-i", str(src),
            "-af", f"adelay={ms}|{ms}", str(dst)]


def pad_audio_end_cmd(src: str | Path, dst: str | Path, delay_s: float) -> list[str]:
    """Append silence (PAD_AUDIO_END_COMMAND, helpers.py:33)."""
    return ["ffmpeg", "-y", "-i", str(src),
            "-af", f"apad=pad_dur={delay_s}", str(dst)]


def remove_audio_pad_cmd(src: str | Path, dst: str | Path, delay_s: int) -> list[str]:
    """Drop the first delay_s seconds (REMOVE_AUDIO_PAD_COMMAND, helpers.py:34)."""
    return ["ffmpeg", "-y", "-i", str(src), "-ss", f"00:00:{int(delay_s):02d}.000",
            "-acodec", "pcm_s16le", str(dst)]


def crop_video_cmd(src: str | Path, dst: str | Path,
                   start_s: float, end_s: float) -> list[str]:
    """Time-segment crop (CROP_VIDEO_FAST_COMMAND, helpers.py:37)."""
    return ["ffmpeg", "-y", "-ss", _ffmpeg_time(start_s), "-to",
            _ffmpeg_time(end_s), "-i", str(src), str(dst)]


def crop_video_multiple_cmd(src: str | Path,
                            segments: list[tuple[float, float, str]]) -> list[str]:
    """Several segment crops in ONE ffmpeg run (CROP_VIDEO_MULTIPLE_COMMAND,
    helpers.py:38 + avspeech usage). segments: (start_s, end_s, out_path)."""
    cmd = ["ffmpeg", "-y", "-i", str(src)]
    for start_s, end_s, out in segments:
        cmd += ["-ss", _ffmpeg_time(start_s), "-to", _ffmpeg_time(end_s), str(out)]
    return cmd


def speed_cmd(src: str | Path, dst: str | Path, speed: float) -> list[str]:
    """Speed-alter video+audio together (VIDEO_SPEED_ALTER_COMMAND,
    helpers.py:39: setpts 1/speed on video, atempo speed on audio)."""
    return ["ffmpeg", "-y", "-i", str(src), "-filter_complex",
            f"[0:v]setpts={1.0 / speed}*PTS[v];[0:a]atempo={speed}[a]",
            "-map", "[v]", "-map", "[a]", str(dst)]


def normalize_audio_cmd(src: str | Path, dst: str | Path,
                        sr: int = 16_000) -> list[str]:
    """EBU R128 loudness normalization — in-process equivalent of the
    reference's ffmpeg-normalize wrapper (NORMALISE_AUDIO_COMMAND,
    helpers.py:31, which drives the same loudnorm filter)."""
    return ["ffmpeg", "-y", "-i", str(src),
            "-af", "loudnorm=I=-23.0:LRA=7.0:TP=-2.0",
            "-ar", str(sr), str(dst)]


def _ffmpeg_time(seconds: float) -> str:
    h = int(seconds // 3600)
    m = int(seconds % 3600 // 60)
    s = seconds % 60
    return f"{h:02d}:{m:02d}:{s:06.3f}"


# formats ffprobe may report that are not real videos (helpers.py:41)
INVALID_VIDEO_FORMATS = ("image2", "tty", "ico", "gif", "pipe")


def probe(path: str | Path) -> dict:
    """ffprobe JSON (streams + format); {} when ffprobe is unavailable."""
    import json

    if shutil.which("ffprobe") is None:
        return {}
    out = subprocess.run(
        ["ffprobe", "-v", "quiet", "-print_format", "json",
         "-show_streams", "-show_format", str(path)],
        capture_output=True, check=False)
    if out.returncode != 0:
        return {}  # corrupt / non-media input: callers treat {} as invalid
    try:
        return json.loads(out.stdout or b"{}")
    except ValueError:
        return {}


def get_fps(path: str | Path) -> float | None:
    info = probe(path)
    for s in info.get("streams", []):
        if s.get("codec_type") == "video":
            num, den = s["r_frame_rate"].split("/")
            return float(num) / float(den)
    return None


def get_duration_s(path: str | Path) -> float | None:
    info = probe(path)
    dur = info.get("format", {}).get("duration")
    return float(dur) if dur is not None else None


def is_valid_video_format(path: str | Path) -> bool | None:
    """False for the pseudo-video formats the gateway rejects
    (helpers.py:41 INVALID_VIDEO_FORMATS); None when ffprobe is absent."""
    info = probe(path)
    if not info:
        return None
    fmt = info.get("format", {}).get("format_name", "")
    return not any(bad in fmt.split(",") for bad in INVALID_VIDEO_FORMATS)


def run(cmd: list[str]) -> bool:
    if not ffmpeg_available():
        return False
    subprocess.run(cmd, check=True, capture_output=True)
    return True
