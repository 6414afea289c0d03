"""Shared helpers for the chip-profiling scripts.

Importing this module also puts the repo root on sys.path, so scripts can
`import _bench_util` first and then `from lip2speech_tpu...` directly.

Timing follows the axon relay rules (NOTES.md "Environment gotchas"):
median over iters of a full dispatch -> device -> host fetch, in ms; the
caller measures a trivial same-input program the same way ("relay floor")
and subtracts it to get device time.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync_time(fn, args, iters):
    np.asarray(fn(*args))                      # warmup/compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3          # ms


def flops_of(fn, args):
    try:
        return float(fn.lower(*args).compile().cost_analysis()["flops"])
    except Exception:  # noqa: BLE001
        return None
