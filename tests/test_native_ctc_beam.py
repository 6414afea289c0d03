"""C CTC prefix beam (native/ctc_beam.c) vs the pure-Python oracle."""

import numpy as np
import pytest

from lip2speech_tpu.data.text import ctc_beam_search
from lip2speech_tpu.native import ctc_beam_search_native


def _logp(rng, t, c):
    x = rng.standard_normal((t, c)).astype(np.float32)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def test_native_matches_python_fuzz():
    rng = np.random.default_rng(0)
    ran = 0
    for trial in range(40):
        t = int(rng.integers(1, 25))
        c = int(rng.integers(2, 14))
        bw = int(rng.integers(1, 12))
        lp = _logp(rng, t, c)
        got = ctc_beam_search_native(lp, beam_width=bw, blank=0)
        if got is None:
            pytest.skip("no C compiler available")
        want = ctc_beam_search(lp, beam_width=bw, blank=0, use_native=False)
        assert got[0] == want[0], (trial, got, want)
        np.testing.assert_allclose(got[1], want[1], atol=1e-4)
        ran += 1
    assert ran == 40


def test_dispatch_uses_native_transparently():
    rng = np.random.default_rng(1)
    lp = _logp(rng, 12, 6)
    a = ctc_beam_search(lp, beam_width=8, blank=0)               # native
    b = ctc_beam_search(lp, beam_width=8, blank=0, use_native=False)
    assert a[0] == b[0]
    np.testing.assert_allclose(a[1], b[1], atol=1e-4)


def test_native_greedy_case():
    # one dominant class per frame with blanks collapsing repeats
    lp = np.full((5, 4), -10.0, np.float32)
    for t, c in enumerate([1, 1, 0, 2, 2]):
        lp[t, c] = -0.01
    got = ctc_beam_search_native(lp, beam_width=4, blank=0)
    if got is None:
        pytest.skip("no C compiler available")
    assert got[0] == [1, 2]
