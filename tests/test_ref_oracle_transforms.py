"""Parity vs the REAL reference augmentation transforms.

Oracle: multi_target_lip2speech/utils_aug.py classes (loaded file-directly
with torchvision stubbed; the reference's own code, not a mirror).

The reference draws from Python's global `random`; our transforms take a
numpy Generator. To compare exactly, both sides are driven by the SAME
scripted value sequence: `random.*` is monkeypatched for the reference and a
duck-typed fake Generator feeds our functions.
"""

import numpy as np
import pytest

import ref_oracle

from lip2speech_tpu.data import transforms as tf


class ScriptedRng:
    """Pops scripted values; duck-types np.random.Generator for transforms
    and Python's random module for the reference."""

    def __init__(self, values):
        self.values = list(values)

    def _pop(self):
        return self.values.pop(0)

    # np.random.Generator surface
    def random(self):
        return self._pop()

    def uniform(self, lo, hi):
        v = self._pop()
        assert lo <= v <= hi, (lo, v, hi)
        return v

    def integers(self, lo, hi):
        v = self._pop()
        assert lo <= v < hi, (lo, v, hi)
        return v

    # Python random-module surface (reference side)
    def randint(self, lo, hi):  # inclusive hi
        v = self._pop()
        assert lo <= v <= hi, (lo, v, hi)
        return v


def _patch_random(monkeypatch, mod, values):
    rng = ScriptedRng(values)
    monkeypatch.setattr(mod.random, "random", rng.random)
    monkeypatch.setattr(mod.random, "uniform", rng.uniform)
    monkeypatch.setattr(mod.random, "randint", rng.randint)
    return rng


@pytest.fixture(scope="module")
def aug():
    return ref_oracle.utils_aug()


def _frames(t=8, h=16, w=20, seed=0):
    return np.random.default_rng(seed).standard_normal((t, h, w)).astype(np.float32)


def test_center_crop_vs_reference(aug):
    x = _frames(h=17, w=21)
    ref = aug.CenterCrop((12, 12))(x.copy())
    ours = tf.center_crop(x, 12)
    np.testing.assert_array_equal(ours, ref)


def test_normalize_vs_reference(aug):
    x = _frames()
    ref = aug.Normalize(tf.IMAGE_MEAN, tf.IMAGE_STD)(x.copy())
    ours = (x - tf.IMAGE_MEAN) / tf.IMAGE_STD
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_random_crop_vs_reference(aug, monkeypatch):
    x = _frames(h=17, w=21)
    dh, dw = 3, 5
    _patch_random(monkeypatch, aug, [dw, dh])     # reference draws w offset first
    ref = aug.RandomCrop((12, 12))(x.copy())
    ours = tf.random_crop(x, 12, ScriptedRng([dh, dw]))
    np.testing.assert_array_equal(ours, ref)


def test_horizontal_flip_vs_reference(aug, monkeypatch):
    x = _frames()
    _patch_random(monkeypatch, aug, [0.1])        # 0.1 < 0.5 -> flip
    ref = aug.HorizontalFlip(0.5)(x.copy())
    ours = tf.horizontal_flip(x, ScriptedRng([0.1]))
    np.testing.assert_array_equal(ours, ref)
    # no-flip branch
    _patch_random(monkeypatch, aug, [0.9])
    ref = aug.HorizontalFlip(0.5)(x.copy())
    ours = tf.horizontal_flip(x, ScriptedRng([0.9]))
    np.testing.assert_array_equal(ours, ref)


def test_random_erase_vs_reference(aug, monkeypatch):
    """Includes the reference's erase-to-corner bug (get_params returns the
    FULL frame dims as the rect size, utils_aug.py:176-183)."""
    x = _frames(h=16, w=20)
    # draws: p-trigger, area fraction, log-aspect, i, j
    script = [0.2, 0.10, 0.0, 4, 7]
    _patch_random(monkeypatch, aug, list(script))
    ref = aug.RandomErase(p=0.5)(x.copy())
    ours = tf.random_erase(x, ScriptedRng(list(script)))
    np.testing.assert_array_equal(ours, ref)
    assert (ref[:, 4:, 7:] == 0).all() and (ref[:, :4, :] != 0).all()


def test_time_mask_vs_reference(aug, monkeypatch):
    x = _frames(t=60)
    # two hops of 25 frames: (mask_len, mask_start) per hop
    script = [7, 3, 4, 18]
    _patch_random(monkeypatch, aug, list(script))
    ref = aug.TimeMask()(x.copy())
    ours = tf.time_mask(x, ScriptedRng(list(script)))
    np.testing.assert_array_equal(ours, ref)
    assert (ref[3:10] == 0).all() and (ref[25 + 18 : 25 + 22] == 0).all()
