"""Metric sanity + (when available) pystoi cross-check."""

import numpy as np
import pytest

from lip2speech_tpu.eval import metrics as M


def _speechlike(n=32000, seed=0):
    """Modulated multi-tone signal with speech-band energy."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    sig = np.zeros(n)
    for f in [220, 450, 800, 1500, 2500]:
        sig += rng.uniform(0.3, 1.0) * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    return (sig * env / np.abs(sig * env).max()).astype(np.float64)


def test_stoi_identity_and_noise_ordering():
    x = _speechlike()
    rng = np.random.default_rng(1)
    assert M.stoi(x, x) > 0.99
    noisy_10db = x + rng.normal(0, np.sqrt((x ** 2).mean() / 10 ** (10 / 10)), len(x))
    noisy_0db = x + rng.normal(0, np.sqrt((x ** 2).mean()), len(x))
    s_clean = M.stoi(x, noisy_10db)
    s_noisy = M.stoi(x, noisy_0db)
    assert 0 < s_noisy < s_clean < 1


def test_estoi_identity_and_ordering():
    x = _speechlike(seed=2)
    rng = np.random.default_rng(3)
    assert M.estoi(x, x) > 0.99
    noisy = x + rng.normal(0, np.sqrt((x ** 2).mean()), len(x))
    assert M.estoi(x, noisy) < M.estoi(x, x)


def test_stoi_matches_pystoi_if_available():
    pystoi = pytest.importorskip("pystoi")
    x = _speechlike(seed=4)
    rng = np.random.default_rng(5)
    y = x + rng.normal(0, 0.1, len(x))
    np.testing.assert_allclose(M.stoi(x, y), pystoi.stoi(x, y, 16000), atol=1e-3)
    np.testing.assert_allclose(M.estoi(x, y), pystoi.stoi(x, y, 16000, extended=True), atol=1e-3)


def test_wer():
    assert M.wer("the cat sat", "the cat sat") == 0.0
    assert M.wer("the cat sat", "the cat") == pytest.approx(1 / 3)
    assert M.corpus_wer(["a b", "c d"], ["a b", "c x"]) == pytest.approx(1 / 4)
    assert M.wer("Hello, World!", "hello world") == 0.0


def test_viseme_distance():
    assert M.viseme_distance("bat", "bat") == 0.0
    # p/b/m collapse to one viseme: "bat" vs "mat" are visually identical
    assert M.viseme_distance("bat", "mat") == 0.0
    assert M.viseme_distance("bat", "fat") > 0.0
    lex = {"bat": ["B", "AE1", "T"], "mat": ["M", "AE1", "T"]}
    assert M.viseme_distance("bat", "mat", lex) == 0.0
