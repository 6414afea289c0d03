"""Overlay predicted audio onto source videos (listening copies).

Rebuild of reference overlay.py:12-71 with both its debug options:
--landmarks-dir draws the per-frame landmarks onto the video (reference
helpers.debug_video, in-image via cv2), --denoise-and-normalise runs the
in-process normalize->spectral-gate->normalize chain (reference
preprocess_audio) on each wav. Muxing prefers the ffmpeg binary and falls
back to the IN-PROCESS native libav shim (native/media_mux.c); a manifest
of (video, wav, out) triples is always written.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
from pathlib import Path

import numpy as np


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def draw_landmarks_video(video_path: Path, landmarks_path: Path,
                         out_path: Path, fps: float = 25.0) -> bool:
    """Debug copy of the video with landmark dots (reference helpers.py
    debug_video / overlay.py:37-43). Returns False if cv2 can't decode."""
    try:
        import cv2
    except ImportError:
        return False
    if not hasattr(cv2, "VideoCapture"):  # bare namespace package hazard
        return False
    from lip2speech_tpu.pipeline.landmarks import PrecomputedLandmarks

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        return False
    frames = []
    ok, frame = cap.read()
    while ok:
        frames.append(frame)
        ok, frame = cap.read()
    cap.release()
    if not frames:
        return False
    lms = PrecomputedLandmarks(landmarks_path).load()
    out_path.parent.mkdir(parents=True, exist_ok=True)
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(str(out_path),
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for frame, lm in zip(frames, lms):
        if lm is not None:
            for x, y in np.asarray(lm, np.float64).reshape(-1, 2):
                cv2.circle(frame, (int(round(x)), int(round(y))), 2,
                           (0, 255, 0), -1)
        writer.write(frame)
    writer.release()
    return out_path.exists() and out_path.stat().st_size > 0


def overlay_audio(video_path: Path, wav_path: Path, out_path: Path) -> bool:
    """Mux wav over video (replacing its audio): ffmpeg binary when present,
    else IN-PROCESS through the native libav shim (native/media_mux.c —
    stream-copied video + AAC audio, -shortest semantics). Returns False
    only when neither backend exists."""
    out_path.parent.mkdir(parents=True, exist_ok=True)
    if ffmpeg_available():
        subprocess.run(
            ["ffmpeg", "-y", "-i", str(video_path), "-i", str(wav_path),
             "-map", "0:v", "-map", "1:a", "-c:v", "copy", "-shortest",
             str(out_path)],
            check=True, capture_output=True)
        return True
    from lip2speech_tpu import native
    from lip2speech_tpu.utils.audio_io import read_wav

    wav, sr = read_wav(wav_path)
    if wav.ndim > 1:
        wav = wav.mean(axis=1)
    return native.mux_overlay(video_path, wav, sr, out_path)


def main():
    # host-side tool (like the reference's): the denoise chain is a few STFTs,
    # not worth attaching a TPU for — and must not stall when no device is up
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # a backend is already initialized (e.g. called from tests)

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video-dir", required=True)
    p.add_argument("--pred-wav-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--landmarks-dir",
                   help="draw <name>.pkl/.npy landmarks onto each video")
    p.add_argument("--denoise-and-normalise", action="store_true",
                   help="clean each wav in-process before muxing")
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
        entry = {"video": str(video), "wav": str(wav)}
        if args.landmarks_dir:
            for lext in (".pkl", ".npy"):
                lm = Path(args.landmarks_dir) / rel.parent / (rel.name + lext)
                if lm.exists():
                    debug = out_dir / rel.parent / (rel.name + "_landmarks.mp4")
                    if draw_landmarks_video(video, lm, debug):
                        video = debug          # mux onto the debug copy
                        entry["landmarks_video"] = str(debug)
                    break
        if args.denoise_and_normalise:
            from lip2speech_tpu.ops.denoise import preprocess_audio
            from lip2speech_tpu.utils.audio_io import read_wav, write_wav

            raw, sr = read_wav(wav)
            clean = out_dir / rel.parent / (rel.name + "_denoised.wav")
            clean.parent.mkdir(parents=True, exist_ok=True)
            write_wav(clean, preprocess_audio(raw), sr)
            wav = clean
            entry["denoised_wav"] = str(clean)
        out = out_dir / rel.parent / (rel.name + "_overlay.mp4")
        entry["out"] = str(out)
        pairs.append(entry)
        if overlay_audio(video, wav, out):
            muxed += 1

    (out_dir / "overlay_manifest.json").write_text(json.dumps(pairs, indent=2))
    print(json.dumps({"pairs": len(pairs), "muxed": muxed,
                      "backend": ("ffmpeg" if ffmpeg_available()
                                  else "native-libav")}))


if __name__ == "__main__":
    main()
