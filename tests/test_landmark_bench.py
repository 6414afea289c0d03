"""Quantified landmark-path accuracy (VERDICT r2 next #5).

Thresholds over the synthetic-hard benchmark in tests/landmark_bench.py.
The committed table lives in QUALITY.md (scripts/landmark_report.py).
"""

import numpy as np

from tests.landmark_bench import SCENARIOS, run_all


def test_benchmark_thresholds():
    rows = run_all()
    by_name = {r["scenario"]: r for r in rows}
    assert set(by_name) == set(SCENARIOS)

    mean_box = float(np.mean([r["box_iou"] for r in rows]))
    mean_crop = float(np.mean([r["crop_iou"] for r in rows]))
    assert mean_box >= 0.80, rows
    assert mean_crop >= 0.80, rows

    # every scenario individually: face found, crop center within 6% of the
    # face width, box never catastrophically wrong
    for r in rows:
        assert r["detected_frames"] == r["n_frames"], r
        assert r["center_err_rel"] <= 0.06, r
        assert r["box_iou"] >= 0.6, r

    # the easy scenarios must stay excellent (regression floor)
    for name in ("centered_plain", "corner_distractor", "motion_jitter"):
        assert by_name[name]["box_iou"] >= 0.88, by_name[name]


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
