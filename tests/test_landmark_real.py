"""REAL-VIDEO landmark tier + raw-video e2e (VERDICT r4 next #3).

/root/reference/datasets/example.mp4 is the only real face video in the
image (132 frames, 224x224, 25 fps, profile pose) and a BASELINE.json named
config; until r5 it had never been run through anything. Thresholds are
strict where measurement allows (the cascade detects 132/132).

Scoring has no GT (no landmark annotations exist for the clip), so the
real-video tier asserts the properties the mouth-ROI pipeline needs:
coverage, temporal stability, and geometric plausibility — plus a visual-
proxy check that the cropped ROI actually contains the high-motion mouth
region (lips move, cheeks don't).
"""

import os

import numpy as np
import pytest

from lip2speech_tpu.pipeline import landmarks as lmk
from tests.landmark_bench import EXAMPLE_MP4, score_real_video

needs_example = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_MP4), reason="example.mp4 not in image")
needs_cascade = pytest.mark.skipif(
    not lmk.CascadeLandmarks.available(), reason="no cascade XMLs")


@needs_example
@needs_cascade
def test_cascade_real_video_tier():
    r = score_real_video(lmk.CascadeLandmarks())
    assert r["detected_rate"] == 1.0, r              # measured 132/132
    assert r["center_jump_rel_p95"] <= 0.05, r       # measured 0.011
    assert r["width_cv"] <= 0.15, r                  # measured 0.087
    assert r["mouth_in_box_rate"] >= 0.95, r         # measured 1.0
    assert r["box_sane_rate"] >= 0.95, r             # measured 1.0


@needs_example
@needs_cascade
def test_cascade_roi_contains_moving_mouth():
    """The 96x96 mouth ROI must capture the talking mouth: the center of
    temporal motion inside the ROI stack should carry a large share of the
    clip's lip motion. A collar/jaw crop (the pre-r5 failure mode measured
    on this clip) has much lower interior motion energy."""
    from lip2speech_tpu.data.video_io import load_video_gray

    frames = load_video_gray(EXAMPLE_MP4)
    roi = lmk.extract_mouth_video(frames, lmk.CascadeLandmarks())
    assert roi.shape == (len(frames), 96, 96)
    d = np.abs(np.diff(roi.astype(np.float32), axis=0)).mean(axis=0)
    # motion energy concentrated in the central band (the lips), not the
    # crop edges (which would indicate the mouth sits outside the ROI)
    inner = d[24:72, 16:80].mean()
    border = np.concatenate([d[:8].ravel(), d[-8:].ravel()]).mean()
    assert inner > border, (inner, border)
    assert inner > 2.0, inner                         # measured ~12


@needs_example
def test_default_landmarker_prefers_cascade():
    prov = lmk.default_landmarker()
    if lmk.CascadeLandmarks.available():
        assert isinstance(prov, lmk.CascadeLandmarks)
    else:
        assert isinstance(prov, lmk.HeuristicLandmarks)


@needs_cascade
def test_cascade_pose_state_reset_between_clips():
    """A reused provider must not leak the previous clip's facing
    direction or mouth track (ADVICE r4: stale self._pose shifted the
    mouth window to the wrong side of a frontal face)."""
    from tests.landmark_bench import render_video

    prov = lmk.CascadeLandmarks()
    prov._pose = "left"                               # poison the state
    prov._mouth_track = np.array([999.0, 999.0])
    frames, boxes, mouths = render_video(t=4)
    lms = prov(frames)
    assert all(lm is not None for lm in lms)
    c = lms[0][48:68].mean(axis=0)
    err = np.hypot(c[0] - mouths[0][0], c[1] - mouths[0][1])
    assert err <= 0.08 * (boxes[0][2] - boxes[0][0]), err


@needs_cascade
def test_cascade_synthetic_calibration():
    """Box calibration keeps the cascade competitive on the synthetic
    envelope (ADVICE r4: pre-calibration it regressed centered_plain to
    box 0.74 / crop 0.58 vs heuristic 0.94/0.90)."""
    from tests.landmark_bench import score_scenario

    r = score_scenario("centered_plain", provider=lmk.CascadeLandmarks())
    assert r["box_iou"] >= 0.85, r                    # measured 0.93
    assert r["crop_iou"] >= 0.80, r                   # measured 0.88
    assert r["detected_frames"] == r["n_frames"], r


@needs_example
@needs_cascade
@pytest.mark.slow
def test_raw_video_e2e_synthesise():
    """BASELINE.json config #3, exercised end-to-end for the first time in
    r5: example.mp4 (raw, uncropped, real face) -> cascade landmarks ->
    mouth crop -> jitted synthesis -> waveform."""
    from lip2speech_tpu.data.video_io import load_video_gray
    from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline
    from tests.test_server import TINY

    frames = load_video_gray(EXAMPLE_MP4)[:24]        # CPU-suite sizing
    roi = lmk.extract_mouth_video(frames, lmk.default_landmarker())
    pipe = Lip2SpeechPipeline.initialize_random(TINY, frames=8)
    res = pipe.synthesise_batch(
        roi[None, ..., None].astype(np.float32) / 255.0,
        np.ones((1, len(roi)), bool),
        np.zeros((1, 256), np.float32))[0]
    assert res.wav.shape == (len(roi) * 640,)
    assert np.isfinite(res.wav).all()
    assert np.abs(res.wav).max() <= 1.0
    assert res.units.shape == (2 * len(roi),)
