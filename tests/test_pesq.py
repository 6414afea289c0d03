"""In-tree PESQ (ITU-T P.862, eval/pesq_p862.py) behavioral anchors.

The bit-exact comparison against the ITU code is gated on the optional
`pesq` package (absent in this image); the in-image tests pin the
properties every P.862 implementation must have: identity ceiling, SNR
monotonicity, level invariance (fix_power_level), constant-delay
invariance (crude alignment), asymmetry (additive noise worse than
attenuation), and the MOS-LQO output range.
"""

import numpy as np
import pytest

from lip2speech_tpu.eval import metrics
from lip2speech_tpu.eval.pesq_p862 import pesq

FS = 16_000


def _speechlike(seconds=2.0, seed=0):
    """Modulated multi-tone with pauses — exercises VAD/active frames."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * FS)) / FS
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 1.7 * t)
    x = np.zeros_like(t)
    phase = np.cumsum(2 * np.pi * f0 / FS)
    for h, a in [(1, 1.0), (2, 0.6), (3, 0.4), (5, 0.25), (8, 0.12)]:
        x += a * np.sin(h * phase + rng.uniform(0, np.pi))
    env = np.clip(np.sin(2 * np.pi * 2.3 * t) + 0.4, 0.0, None)
    x = (x * env).astype(np.float64)
    x[: FS // 5] = 0.0      # leading silence
    x[-FS // 5:] = 0.0      # trailing silence
    return x / np.max(np.abs(x)) * 0.5


def _add_noise(x, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(len(x))
    p_x = np.mean(x**2)
    p_n = np.mean(noise**2)
    return x + noise * np.sqrt(p_x / (p_n * 10 ** (snr_db / 10)))


def test_identity_ceiling():
    x = _speechlike()
    s = pesq(x, x)
    assert s > 4.0, s


def test_snr_monotonicity():
    x = _speechlike()
    scores = [pesq(x, _add_noise(x, snr)) for snr in (40, 25, 15, 5)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.0 and scores[-1] < 3.0, scores


def test_range_and_floor():
    x = _speechlike()
    junk = np.random.default_rng(3).standard_normal(len(x)) * 0.3
    s = pesq(x, junk)
    assert 1.0 <= s <= 2.8, s


def test_level_invariance():
    x = _speechlike()
    deg = _add_noise(x, 20)
    a = pesq(x, deg)
    b = pesq(x, deg * 0.25)          # fix_power_level must undo the gain
    assert abs(a - b) < 0.05, (a, b)


def test_constant_delay_invariance():
    x = _speechlike()
    deg = _add_noise(x, 20)
    a = pesq(x, deg)
    shifted = np.concatenate([np.zeros(1280), deg])   # +80 ms delay
    b = pesq(x, shifted)
    assert abs(a - b) < 0.25, (a, b)


def test_asymmetry_additive_worse_than_attenuation():
    """P.862's asymmetry factor: added spectral content hurts more than
    the same loudness delta removed."""
    x = _speechlike()
    added = _add_noise(x, 12)
    attenuated = x * 0.9 + 0.1 * np.roll(x, 3)   # mild smearing, no new bands
    assert pesq(x, added) < pesq(x, attenuated)


def test_metrics_entry_point_never_none():
    x = _speechlike(1.2)
    s = metrics.pesq_score(x, _add_noise(x, 18))
    assert s is not None and 1.0 <= s <= 4.7


def test_wideband_mapping_mode():
    x = _speechlike()
    nb = pesq(x, _add_noise(x, 15), mode="nb")
    wb = pesq(x, _add_noise(x, 15), mode="wb")
    assert 1.0 <= nb <= 4.644 and 1.0 <= wb <= 4.644


def test_vs_itu_package_when_available():
    """Gated on the optional `pesq` package (ITU reference code): rank
    agreement on an SNR ladder and bounded absolute deviation (the in-tree
    Bark tables are analytic, not the ITU hard-coded ones)."""
    itu = pytest.importorskip("pesq")
    x = _speechlike(3.0)
    ladder = [40, 25, 15, 5]
    ours = [pesq(x, _add_noise(x, s), mode="nb") for s in ladder]
    ref = [float(itu.pesq(FS, x, _add_noise(x, s), "nb")) for s in ladder]
    assert all(a > b for a, b in zip(ref, ref[1:]))
    assert all(a > b for a, b in zip(ours, ours[1:]))
    assert np.max(np.abs(np.array(ours) - np.array(ref))) < 0.5
