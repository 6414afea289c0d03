"""Quantified landmark-path accuracy (VERDICT r2 next #5).

Thresholds over the synthetic-hard benchmark in tests/landmark_bench.py.
The committed table lives in QUALITY.md (scripts/landmark_report.py).
"""

import numpy as np

from tests.landmark_bench import ENVELOPE_SCENARIOS, SCENARIOS, run_all


def test_benchmark_thresholds():
    rows = run_all()
    by_name = {r["scenario"]: r for r in rows}
    assert set(by_name) == set(SCENARIOS)

    env = [by_name[n] for n in ENVELOPE_SCENARIOS]
    mean_box = float(np.mean([r["box_iou"] for r in env]))
    mean_crop = float(np.mean([r["crop_iou"] for r in env]))
    assert mean_box >= 0.80, env
    assert mean_crop >= 0.80, env

    # every in-envelope scenario individually: face found, crop center
    # within 6% of the face width, box never catastrophically wrong
    for r in env:
        assert r["detected_frames"] == r["n_frames"], r
        assert r["center_err_rel"] <= 0.06, r
        assert r["box_iou"] >= 0.6, r

    # the easy scenarios must stay excellent (regression floor)
    for name in ("centered_plain", "corner_distractor", "motion_jitter"):
        assert by_name[name]["box_iou"] >= 0.88, by_name[name]


def test_non_frontal_and_tiny_face_thresholds():
    """Beyond-envelope rows (VERDICT r3 next #9): quantified instead of
    just listed as failure modes. Measured r4 (margins below measured):
    yaw30 box .912, roll20 box .910, 55-deg profile box .549/crop .758,
    tiny 12.5%-width face box .815/crop .750 (via the relaxed-floor
    full-frame retry)."""
    rows = {r["scenario"]: r for r in run_all()}

    for name, box_min, err_max in (("yaw_30deg", 0.85, 0.06),
                                   ("roll_20deg", 0.85, 0.05)):
        r = rows[name]
        assert r["detected_frames"] == r["n_frames"], r
        assert r["box_iou"] >= box_min, r
        assert r["center_err_rel"] <= err_max, r

    # degraded but bounded: mouth crops stay usable even when the box
    # under-covers the turned/small face
    for name in ("yaw_55deg_profile", "tiny_face_12pct"):
        r = rows[name]
        assert r["detected_frames"] == r["n_frames"], r
        assert r["box_iou"] >= 0.45, r
        assert r["crop_iou"] >= 0.65, r
        assert r["center_err_rel"] <= 0.12, r


def test_motion_gating_noop_on_still_scene():
    """A single repeated frame has no motion signal: the detector must fall
    back to the static path, not divide by a zero-motion map."""
    from lip2speech_tpu.pipeline import landmarks as lmk
    from tests.landmark_bench import render_video

    frames, boxes, _ = render_video(t=1)
    still = np.repeat(frames, 6, axis=0)   # 6 identical frames
    prov = lmk.HeuristicLandmarks()
    lms = prov(still)
    assert all(lm is not None for lm in lms)
    pred_box = (lms[0][:, 0].min(), lms[0][:, 1].min(),
                lms[0][:, 0].max(), lms[0][:, 1].max())
    assert lmk.box_iou(pred_box, boxes[0]) >= 0.8
