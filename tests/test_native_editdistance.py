"""Native C edit distance: correctness vs the Python DP + speed sanity."""

import time

import numpy as np

from lip2speech_tpu.decode.units import unit_edit_distance, unit_wer
from lip2speech_tpu.native import _build, edit_distance


def test_native_builds_and_matches_python():
    assert _build("editdistance") is not None, \
        "system compiler should be available here"
    rng = np.random.default_rng(0)
    for n, m in [(0, 5), (5, 0), (1, 1), (40, 37), (200, 180)]:
        a = rng.integers(0, 50, n).tolist()
        b = rng.integers(0, 50, m).tolist()
        assert edit_distance(a, b) == unit_edit_distance(a, b)


def test_native_speed_on_long_unit_sequences():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 200, 1200).tolist()
    b = rng.integers(0, 200, 1200).tolist()
    t0 = time.perf_counter()
    d = edit_distance(a, b)
    dt = time.perf_counter() - t0
    assert d > 0
    assert dt < 0.1, f"native edit distance too slow: {dt:.3f}s"


def test_unit_wer_uses_fast_path():
    hyps = [[1, 2, 3], [4, 5]]
    refs = [[1, 2, 4], [4, 5]]
    assert unit_wer(hyps, refs) == 1 / 5
