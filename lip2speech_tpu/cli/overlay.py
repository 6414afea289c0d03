"""Overlay predicted audio onto source videos (listening copies).

Rebuild of reference overlay.py:12-71. Muxing needs ffmpeg (not in this
image); when absent, the tool still pairs predictions with videos and writes
a manifest of (video, wav) pairs so any muxer can finish the job.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
from pathlib import Path


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def overlay_audio(video_path: Path, wav_path: Path, out_path: Path) -> bool:
    """Mux wav over video (replacing its audio). Returns False if no ffmpeg."""
    if not ffmpeg_available():
        return False
    out_path.parent.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["ffmpeg", "-y", "-i", str(video_path), "-i", str(wav_path),
         "-map", "0:v", "-map", "1:a", "-c:v", "copy", "-shortest",
         str(out_path)],
        check=True, capture_output=True)
    return True


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video-dir", required=True)
    p.add_argument("--pred-wav-dir", required=True)
    p.add_argument("--out-dir", required=True)
    args = p.parse_args()

    video_dir = Path(args.video_dir)
    wav_dir = Path(args.pred_wav_dir)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    pairs = []
    muxed = 0
    for wav in sorted(wav_dir.rglob("*.wav")):
        rel = wav.relative_to(wav_dir).with_suffix("")
        for ext in (".mp4", ".avi", ".mov"):
            video = video_dir / rel.parent / (rel.name + ext)
            if video.exists():
                break
        else:
            continue
        out = out_dir / rel.parent / (rel.name + "_overlay.mp4")
        pairs.append({"video": str(video), "wav": str(wav), "out": str(out)})
        if overlay_audio(video, wav, out):
            muxed += 1

    (out_dir / "overlay_manifest.json").write_text(json.dumps(pairs, indent=2))
    print(json.dumps({"pairs": len(pairs), "muxed": muxed,
                      "ffmpeg": ffmpeg_available()}))


if __name__ == "__main__":
    main()
