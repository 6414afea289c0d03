"""Native (C) host-side helpers, built on first use with the system compiler.

The TPU compute path is JAX/XLA/Pallas; these are the host hot spots where
the reference also leaned on native code (C `editdistance` extension for
unit WER — SURVEY.md §2.8). Compiled with cc -O2 -shared into this package
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
_LIB = None
_TRIED = False


def _build() -> Path | None:
    src = _HERE / "editdistance.c"
    out = _HERE / "_editdistance.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    for cc in ("cc", "gcc", "g++", "clang"):
        try:
            subprocess.run([cc, "-O2", "-shared", "-fPIC", str(src),
                            "-o", str(out)], check=True, capture_output=True)
            return out
        except (FileNotFoundError, subprocess.CalledProcessError):
            continue
    return None


def _lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is None and not _TRIED:
            _TRIED = True
            path = _build()
            if path is not None:
                lib = ctypes.CDLL(str(path))
                lib.edit_distance_i32.restype = ctypes.c_int64
                lib.edit_distance_i32.argtypes = [
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
                _LIB = lib
    return _LIB


def edit_distance(a, b) -> int:
    """Levenshtein distance between two int sequences (C fast path)."""
    lib = _lib()
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
