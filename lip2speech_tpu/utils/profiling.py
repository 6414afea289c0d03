"""Tracing / profiling utilities.

TPU-native replacement for the reference's observability hooks (SURVEY.md §5):
CUDA profiler + NVTX ranges (inference.py:333-336) -> jax.profiler traces;
per-request wall timing (helpers.py:71-76) -> StageTimer; fairseq
StopwatchMeter wps reporting -> TokensPerSecond.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path


@contextlib.contextmanager
def device_trace(logdir: str | Path = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (NVTX-range equivalent)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Accumulating per-stage wall timers (the reference's time_wrapper)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict[str, dict]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_s": round(v / max(self.counts[k], 1), 4)}
                for k, v in sorted(self.totals.items())}

    def dump(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.report(), indent=2))


class TokensPerSecond:
    """Running tokens/s meter (fairseq TimeMeter wps equivalent)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.n = 0

    def update(self, n_tokens: int):
        self.n += n_tokens

    @property
    def avg(self) -> float:
        return self.n / max(time.perf_counter() - self.t0, 1e-9)
