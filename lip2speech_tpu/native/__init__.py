"""Native (C) host-side helpers, built on first use with the system compiler.

The TPU compute path is JAX/XLA/Pallas; these are the host hot spots where
the reference also leaned on native code (SURVEY.md §2.8: the C
`editdistance` extension for unit WER, the C++ `ctcdecode` extension for
CTC beam decoding). Compiled with cc -O2 -shared into this package
directory and loaded via ctypes; callers fall back to pure Python when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LOCK = threading.Lock()
_LIBS: dict = {}


# per-stem extra link flags (media_demux links the system libav — present
# in this image even though the ffmpeg binary is not)
_LINK_FLAGS = {
    "media_demux": ["-lavformat", "-lavcodec", "-lavutil", "-lswresample"],
    "media_mux": ["-lavformat", "-lavcodec", "-lavutil"],
}


def _build(stem: str) -> Path | None:
    src = _HERE / f"{stem}.c"
    out = _HERE / f"_{stem}.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    extra = _LINK_FLAGS.get(stem, [])
    for cc in ("cc", "gcc", "g++", "clang"):
        try:
            subprocess.run([cc, "-O2", "-shared", "-fPIC", str(src),
                            "-o", str(out), "-lm", *extra],
                           check=True, capture_output=True)
            return out
        except (FileNotFoundError, subprocess.CalledProcessError):
            continue
    return None


def _lib(stem: str, configure):
    with _LOCK:
        if stem not in _LIBS:
            lib = None
            try:
                path = _build(stem)
                if path is not None:
                    lib = ctypes.CDLL(str(path))
                    configure(lib)
            except (OSError, AttributeError):
                # stale/truncated .so or missing symbol: fall back to Python
                # permanently rather than re-raising on every call
                lib = None
            _LIBS[stem] = lib
    return _LIBS[stem]


def _cfg_editdistance(lib):
    lib.edit_distance_i32.restype = ctypes.c_int64
    lib.edit_distance_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]


def _cfg_ctc_beam(lib):
    lib.ctc_beam_search_f32.restype = ctypes.c_int64
    lib.ctc_beam_search_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double)]


def _cfg_media_demux(lib):
    lib.l2s_decode_audio.restype = ctypes.c_long
    lib.l2s_decode_audio.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long)]
    lib.l2s_free.restype = None
    lib.l2s_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.l2s_probe_audio.restype = ctypes.c_long
    lib.l2s_probe_audio.argtypes = [ctypes.c_char_p]


_DEMUX_ERRORS = {
    -1: "container open/probe failed",
    -2: "no audio stream",
    -3: "audio decoder unavailable",
    -4: "resampler init failed",
    -5: "decode error",
    -6: "allocation failure",
}


def decode_audio(path, target_sr: int = 16000) -> np.ndarray | None:
    """In-process audio extraction: first audio stream of any libav
    container -> mono float32 at target_sr (the reference's
    `ffmpeg -i src -vn -ac 1 -ar SR` subprocess, config.py
    EXTRACT_AUDIO_COMMAND, without the binary).

    Returns None when no compiler/libav is available (callers keep their
    ffmpeg-binary gate as the fallback); raises ValueError for real decode
    errors (missing audio stream, corrupt file)."""
    lib = _lib("media_demux", _cfg_media_demux)
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long(0)
    rc = lib.l2s_decode_audio(str(path).encode(), int(target_sr),
                              ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        raise ValueError(
            f"audio decode of {path} failed: "
            f"{_DEMUX_ERRORS.get(rc, f'code {rc}')}")
    try:
        if n.value == 0:
            return np.zeros(0, np.float32)
        return np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.l2s_free(out)


def probe_audio_sample_rate(path) -> int | None:
    """Sample rate of the container's first audio stream; 0 when the
    container has NO audio stream; None when the shim is unavailable."""
    lib = _lib("media_demux", _cfg_media_demux)
    if lib is None:
        return None
    rc = lib.l2s_probe_audio(str(path).encode())
    if rc == -2:
        return 0
    if rc < 0:
        raise ValueError(f"cannot probe {path}")
    return int(rc)


def _cfg_media_mux(lib):
    lib.l2s_mux_overlay.restype = ctypes.c_long
    lib.l2s_mux_overlay.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.c_int, ctypes.c_char_p]


_MUX_ERRORS = {
    -1: "cannot open input video",
    -2: "no video stream",
    -3: "cannot open output",
    -4: "AAC encoder unavailable",
    -5: "container header/trailer write failed",
    -6: "packet write failed",
    -7: "allocation failure",
}


def mux_overlay(video_path, audio: np.ndarray, sr: int, out_path) -> bool:
    """Replace a video's audio with the given mono float32 PCM, in-process
    (the reference's `ffmpeg -map 0:v -map 1:a -c:v copy -shortest`
    listening-copy mux, overlay.py). Video packets are stream-copied, audio
    is AAC-encoded, audio stops at the video's end. Returns False when the
    shim can't build; raises ValueError on real mux errors."""
    lib = _lib("media_mux", _cfg_media_mux)
    if lib is None:
        return False
    a = np.ascontiguousarray(np.asarray(audio, np.float32))
    rc = lib.l2s_mux_overlay(
        str(video_path).encode(),
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a),
        int(sr), str(out_path).encode())
    if rc != 0:
        raise ValueError(f"mux of {video_path} + audio failed: "
                         f"{_MUX_ERRORS.get(rc, f'code {rc}')}")
    return True


def edit_distance(a, b) -> int:
    """Levenshtein distance between two int sequences (C fast path)."""
    lib = _lib("editdistance", _cfg_editdistance)
    if lib is None:
        from lip2speech_tpu.decode.units import unit_edit_distance

        return unit_edit_distance(list(a), list(b))
    aa = np.ascontiguousarray(np.asarray(a, dtype=np.int32))
    bb = np.ascontiguousarray(np.asarray(b, dtype=np.int32))
    out = lib.edit_distance_i32(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bb))
    if out < 0:
        raise MemoryError("edit_distance allocation failed")
    return int(out)


def ctc_beam_search_native(log_probs: np.ndarray, beam_width: int = 25,
                           blank: int = 0):
    """C CTC prefix beam over (T, C) log-probs -> (labels, score).

    Returns None when no compiler is available (callers fall back to the
    pure-Python lip2speech_tpu.data.text.ctc_beam_search, which implements
    identical semantics and serves as this function's test oracle)."""
    lib = _lib("ctc_beam", _cfg_ctc_beam)
    if lib is None:
        return None
    lp = np.ascontiguousarray(np.asarray(log_probs, dtype=np.float32))
    t, c = lp.shape
    out = np.zeros(max(t, 1), np.int32)
    score = ctypes.c_double(0.0)
    n = lib.ctc_beam_search_f32(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, c,
        int(beam_width), int(blank),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(out),
        ctypes.byref(score))
    if n < 0:
        # allocation failure (the C path preallocates O(T*beam*k)) or
        # output-capacity surprise: let the O(beam)-state Python
        # implementation handle it instead of crashing
        return None
    return [int(x) for x in out[:n]], float(score.value)
