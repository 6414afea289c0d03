"""Mouth-crop geometry tests."""

import numpy as np
import pytest

from lip2speech_tpu.pipeline import mouth_crop as mc


def test_estimate_similarity_recovers_known_transform():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, (5, 2))
    theta, scale, t = 0.3, 1.7, np.array([10.0, -5.0])
    rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    dst = scale * src @ rot.T + t
    m = mc.estimate_similarity(src, dst)
    np.testing.assert_allclose(mc.transform_points(m, src), dst, atol=1e-8)
    # scale encoded in the matrix
    est_scale = np.sqrt(np.linalg.det(m[:2, :2]))
    np.testing.assert_allclose(est_scale, scale, atol=1e-8)


def test_estimate_similarity_matches_skimage_if_available():
    sk = pytest.importorskip("skimage.transform")
    rng = np.random.default_rng(1)
    src = rng.uniform(0, 200, (5, 2))
    dst = rng.uniform(0, 200, (5, 2))
    ours = mc.estimate_similarity(src, dst)
    theirs = sk.estimate_transform("similarity", src, dst).params
    np.testing.assert_allclose(ours, theirs, atol=1e-8)


def test_warp_identity():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    out = mc.warp_image(img, np.eye(3), (64, 64))
    np.testing.assert_array_equal(out, img)


def test_warp_translation():
    img = np.zeros((32, 32), np.uint8)
    img[10, 12] = 255
    m = np.eye(3)
    m[0, 2] = 3.0  # shift x by +3
    out = mc.warp_image(img, m, (32, 32))
    assert out[10, 15] == 255


def test_interpolate_landmarks():
    a = np.zeros((68, 2))
    b = np.ones((68, 2)) * 4
    lms = [None, a, None, None, None, b, None]
    out = mc.interpolate_landmarks(lms)
    np.testing.assert_allclose(out[0], a)           # edge hold
    np.testing.assert_allclose(out[2], a + (b - a) / 4)
    np.testing.assert_allclose(out[3], a + (b - a) / 2)
    np.testing.assert_allclose(out[6], b)           # edge hold


def test_crop_mouth_sequence_centers_mouth():
    """Place a bright blob at the synthetic mouth location; after warp+crop
    the blob must sit near the center of every 96x96 output frame."""
    mean_face = mc.default_mean_face()
    t, h, w = 15, 240, 320
    rng = np.random.default_rng(3)
    frames = np.zeros((t, h, w), np.uint8)
    landmarks = []
    for i in range(t):
        # face translated + scaled per frame
        shift = np.array([60 + i, 30 + (i % 3)])
        scale = 0.8
        lm = mean_face * scale + shift
        mouth = lm[48:68].mean(axis=0)
        mx, my = int(mouth[0]), int(mouth[1])
        frames[i, my - 3 : my + 4, mx - 3 : mx + 4] = 255
        landmarks.append(lm)

    out = mc.crop_mouth_sequence(frames, landmarks, mean_face)
    assert out.shape == (t, 96, 96)
    for i in range(t):
        ys, xs = np.nonzero(out[i] > 128)
        assert len(ys) > 0, f"frame {i}: blob lost"
        cy, cx = ys.mean(), xs.mean()
        assert abs(cy - 48) < 10 and abs(cx - 48) < 10, (i, cy, cx)


def test_cut_patch_clamps_at_borders():
    img = np.arange(100 * 100, dtype=np.uint8).reshape(100, 100)
    # centroid near top-left: clamped
    patch = mc.cut_patch(img, np.array([[2.0, 2.0]]), 48, 48)
    assert patch.shape == (96, 96)
    # NOTE: the reference clamps BEFORE its threshold check, so the
    # "too much bias" raise is unreachable — we reproduce that: far
    # off-screen centroids clamp to the border instead of raising
    patch = mc.cut_patch(img, np.array([[-60.0, 50.0]]), 48, 48)
    assert patch.shape == (96, 96)
