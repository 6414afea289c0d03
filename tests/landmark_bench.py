"""Synthetic-but-hard landmark benchmark (VERDICT r2 next #5).

Renders face-like talking-head videos with known ground truth (face box +
mouth center) across scenarios that stress the dlib-free HeuristicLandmarks:
off-center faces, scale changes, textured background clutter, a static
corner distractor, and motion jitter. Scoring: per-frame detected-box IoU
vs the GT face box, and "crop IoU" — IoU of equal-size mouth-crop squares
centered on predicted vs true mouth center (side = 0.75x face width, the
96x96-ROI-at-face-scale analogue), which is what the 96x96 mouth ROI quality
actually depends on.

Shared by tests/test_landmark_bench.py (thresholds) and
scripts/landmark_report.py (the committed table in QUALITY.md).
"""

from __future__ import annotations

import numpy as np

H, W = 240, 320


def render_video(t=20, seed=0, cx=160.0, cy=120.0, rx=55.0, ry=72.0,
                 background="plain", jitter=0.0, scale_drift=0.0,
                 distractor=False, yaw=0.0, roll=0.0,
                 return_landmarks=False):
    """Returns (frames uint8 (t, H, W), gt_boxes list, mouth_centers list);
    with return_landmarks=True, a 4th element: per-frame (68, 2) ground-truth
    landmarks in the iBUG layout, derived from the same parametric geometry
    that painted the features (shape-predictor training data).

    yaw (radians, proxy): compresses the face horizontally by cos(yaw) and
    shifts the features toward the leading edge by sin(yaw) — the
    silhouette/feature asymmetry of a turned head. roll (radians): in-plane
    head rotation of every feature around the face center. Both are the
    non-frontal cases HeuristicLandmarks documents as its weak spot
    (reference dlib CNN path: face_landmarks_server.py:55-347)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)

    if background == "plain":
        bg = np.full((H, W), 120.0)
    elif background == "gradient":
        bg = 80.0 + 90.0 * xx / W
    elif background == "textured":
        # high-local-variance clutter: the adversary for variance saliency
        bg = np.full((H, W), 120.0)
        for _ in range(14):
            px, py = rng.integers(0, W - 40), rng.integers(0, H - 30)
            pw, ph = rng.integers(18, 42), rng.integers(14, 32)
            bg[py:py + ph, px:px + pw] = rng.uniform(40, 210, (ph, pw))
    else:
        raise ValueError(background)

    frames, boxes, mouths, all_lms = [], [], [], []
    fx, fy, s = cx, cy, 1.0
    for i in range(t):
        if jitter:
            fx += rng.normal(0, jitter)
            fy += rng.normal(0, jitter)
        if scale_drift:
            s = float(np.clip(s + rng.normal(0, scale_drift), 0.75, 1.25))
        _rx, _ry = rx * s, ry * s
        img = bg.copy()
        if distractor:
            # static textured corner blob, face-sized
            img[8:78, 8:78] = 120 + 50 * np.sin(xx[8:78, 8:78] / 3.0) * \
                np.cos(yy[8:78, 8:78] / 4.0)
        # face-local coordinates (u, v): roll rotates them in-plane, yaw
        # compresses u and shifts every feature toward the leading edge
        _rxe = _rx * max(np.cos(yaw), 0.35)
        du = np.sin(yaw) * 0.35 * _rx
        ct, st = np.cos(roll), np.sin(roll)
        u = (xx - fx) * ct + (yy - fy) * st
        v = -(xx - fx) * st + (yy - fy) * ct

        head = (u / _rxe) ** 2 + (v / _ry) ** 2 <= 1.0
        # shaded skin (radial falloff = face-internal texture)
        r2 = (u / _rxe) ** 2 + (v / _ry) ** 2
        img[head] = (195.0 - 35.0 * r2[head])
        for ex in (du - 0.42 * _rxe, du + 0.42 * _rxe):     # eyes + brows
            eye = ((u - ex) / (0.16 * _rxe)) ** 2 + \
                  ((v - (-0.28 * _ry)) / (0.08 * _ry)) ** 2 <= 1.0
            img[eye] = 60.0
            brow = (np.abs(u - ex) < 0.2 * _rxe) & \
                   (np.abs(v - (-0.42 * _ry)) < 0.035 * _ry)
            img[brow] = 85.0
        nose = (np.abs(u - du) < 0.05 * _rxe) & \
               (v > -0.15 * _ry) & (v < 0.18 * _ry)
        img[nose] = 150.0
        mouth_v = 0.48 * _ry
        open_px = (0.05 + 0.035 * np.sin(2 * np.pi * i / max(t, 1))) * _ry
        mouth = (np.abs(u - du) < 0.38 * _rxe) & \
                (np.abs(v - mouth_v) < open_px)
        img[mouth] = 40.0
        img += rng.normal(0, 2.0, (H, W))
        frames.append(np.clip(img, 0, 255))
        # GT box = bounding box of the rotated ellipse
        bw = float(np.hypot(_rxe * ct, _ry * st))
        bh = float(np.hypot(_rxe * st, _ry * ct))
        boxes.append((fx - bw, fy - bh, fx + bw, fy + bh))
        # mouth center back in image coordinates
        mx = fx + du * ct - mouth_v * st
        my = fy + du * st + mouth_v * ct
        mouths.append((mx, my))
        if return_landmarks:
            all_lms.append(_layout_landmarks(fx, fy, _rxe, _ry, du, ct, st,
                                             mouth_v, open_px))
    if return_landmarks:
        return (np.stack(frames).astype(np.uint8), boxes, mouths, all_lms)
    return np.stack(frames).astype(np.uint8), boxes, mouths


def _layout_landmarks(fx, fy, rxe, ry, du, ct, st, mouth_v, open_px):
    """iBUG-68 layout from the renderer's own face-local geometry: the jaw
    traces the painted head ellipse, brows/eyes/nose/lips sit exactly where
    render_video paints them (eye centers du +- 0.42*rxe at -0.28*ry, brows
    -0.42*ry, nose ridge at u=du, outer lips 0.38*rxe x open_px around
    mouth_v)."""
    pts = np.zeros((68, 2))
    # 0..16 jaw: lower head-ellipse arc, temple -> chin -> temple
    alpha = np.pi + np.pi * np.arange(17) / 16.0
    pts[0:17, 0] = rxe * np.cos(alpha)
    pts[0:17, 1] = -ry * np.sin(alpha)
    # 17..26 brows (5 points each at v = -0.42*ry, half-width 0.2*rxe)
    for base, ex in ((17, du - 0.42 * rxe), (22, du + 0.42 * rxe)):
        pts[base:base + 5, 0] = ex + np.linspace(-0.2, 0.2, 5) * rxe
        pts[base:base + 5, 1] = -0.42 * ry
    # 27..30 nose ridge; 31..35 nose base
    pts[27:31, 0] = du
    pts[27:31, 1] = np.linspace(-0.25, 0.12, 4) * ry
    pts[31:36, 0] = du + np.linspace(-0.08, 0.08, 5) * rxe
    pts[31:36, 1] = 0.18 * ry
    # 36..47 eyes: 6 points on each painted eye ellipse
    th6 = 2 * np.pi * np.arange(6) / 6.0
    for base, ex in ((36, du - 0.42 * rxe), (42, du + 0.42 * rxe)):
        pts[base:base + 6, 0] = ex + 0.16 * rxe * np.cos(th6)
        pts[base:base + 6, 1] = -0.28 * ry + 0.08 * ry * np.sin(th6)
    # 48..59 outer lips / 60..67 inner lips around the painted mouth bar
    th12 = 2 * np.pi * np.arange(12) / 12.0
    pts[48:60, 0] = du + 0.38 * rxe * np.cos(th12)
    pts[48:60, 1] = mouth_v + open_px * np.sin(th12)
    th8 = 2 * np.pi * np.arange(8) / 8.0
    pts[60:68, 0] = du + 0.30 * rxe * np.cos(th8)
    pts[60:68, 1] = mouth_v + 0.6 * open_px * np.sin(th8)
    # face-local -> image coordinates (the renderer's roll rotation)
    out = np.empty_like(pts)
    out[:, 0] = fx + pts[:, 0] * ct - pts[:, 1] * st
    out[:, 1] = fy + pts[:, 0] * st + pts[:, 1] * ct
    return out


def render_face_dataset(n=30, seed=0, landmark_slice=slice(0, 68)):
    """n single-frame faces with varied pose/scale/position/background:
    (image (H, W) uint8, face box, (L, 2) landmarks) samples for
    shape-predictor training (reference workflow:
    dlib/generate_shape_predictor_dataset.py + train_shape_predictor.py)."""
    rng = np.random.default_rng(seed)
    backgrounds = ["plain", "gradient", "textured"]
    samples = []
    for i in range(n):
        frames, boxes, _mouths, lms = render_video(
            t=1, seed=int(rng.integers(1 << 31)),
            cx=float(rng.uniform(110, 210)), cy=float(rng.uniform(90, 150)),
            rx=float(rng.uniform(40, 62)), ry=float(rng.uniform(52, 80)),
            yaw=float(rng.uniform(-0.35, 0.35)),
            roll=float(rng.uniform(-0.25, 0.25)),
            background=backgrounds[i % 3],
            return_landmarks=True)
        samples.append((frames[0], boxes[0], lms[0][landmark_slice]))
    return samples


SCENARIOS = {
    "centered_plain": dict(),
    "offcenter_small": dict(cx=95.0, cy=85.0, rx=38.0, ry=50.0),
    "gradient_bg": dict(background="gradient"),
    "textured_clutter": dict(background="textured"),
    "corner_distractor": dict(distractor=True),
    "motion_jitter": dict(jitter=2.5, scale_drift=0.02),
    "clutter_and_motion": dict(background="textured", jitter=2.0),
    # non-frontal / scale rows (VERDICT r3 next #9): the cases the detector
    # documents as its weak spot, quantified instead of just listed
    "yaw_30deg": dict(yaw=np.deg2rad(30.0)),
    "yaw_55deg_profile": dict(yaw=np.deg2rad(55.0)),
    "roll_20deg": dict(roll=np.deg2rad(20.0)),
    "tiny_face_12pct": dict(rx=20.0, ry=26.0),  # face width 12.5% of frame
}

# scenarios inside the detector's documented operating envelope (the
# original r3 table); the non-frontal/tiny rows get their own thresholds
ENVELOPE_SCENARIOS = (
    "centered_plain", "offcenter_small", "gradient_bg", "textured_clutter",
    "corner_distractor", "motion_jitter", "clutter_and_motion",
)


def _square_iou(c_pred, c_true, side_pred, side_true) -> float:
    """IoU of mouth-crop squares. The predicted square is sized from the
    PREDICTED face width (crop size follows the detected scale in
    mouth_crop), so scale errors count against the metric."""
    from lip2speech_tpu.pipeline.landmarks import box_iou

    def sq(c, side):
        return (c[0] - side / 2, c[1] - side / 2,
                c[0] + side / 2, c[1] + side / 2)

    return box_iou(sq(c_pred, side_pred), sq(c_true, side_true))


def score_scenario(name: str, provider=None, t=20, seed=0) -> dict:
    """Run a provider over one scenario; per-frame means of box IoU, mouth
    crop IoU and center error (px, and relative to face width)."""
    from lip2speech_tpu.pipeline import landmarks as lmk

    frames, boxes, mouths = render_video(t=t, seed=seed, **SCENARIOS[name])
    provider = provider or lmk.HeuristicLandmarks()
    lms = provider(frames)

    ious, crop_ious, errs, rel_errs = [], [], [], []
    for i, lm in enumerate(lms):
        gt_box, gt_mouth = boxes[i], mouths[i]
        face_w = gt_box[2] - gt_box[0]
        if lm is None:
            ious.append(0.0)
            crop_ious.append(0.0)
            errs.append(float("nan"))
            rel_errs.append(1.0)
            continue
        pred_box = (lm[:, 0].min(), lm[:, 1].min(),
                    lm[:, 0].max(), lm[:, 1].max())
        ious.append(lmk.box_iou(pred_box, gt_box))
        c_pred = lm[48:68].mean(axis=0)
        err = float(np.hypot(c_pred[0] - gt_mouth[0], c_pred[1] - gt_mouth[1]))
        errs.append(err)
        rel_errs.append(err / face_w)
        crop_ious.append(_square_iou(
            c_pred, gt_mouth,
            side_pred=0.75 * (pred_box[2] - pred_box[0]),
            side_true=0.75 * face_w))
    return {"scenario": name,
            "box_iou": float(np.mean(ious)),
            "crop_iou": float(np.mean(crop_ious)),
            "center_err_px": float(np.nanmean(errs)),
            "center_err_rel": float(np.mean(rel_errs)),
            "detected_frames": int(sum(lm is not None for lm in lms)),
            "n_frames": t}


def run_all(provider=None, t=20, seed=0) -> list[dict]:
    return [score_scenario(n, provider=provider, t=t, seed=seed)
            for n in SCENARIOS]


# --- REAL-VIDEO tier (VERDICT r4 next #3) ----------------------------------
# /root/reference/datasets/example.mp4 is the only real face video in the
# image (132 frames, 224x224, 25 fps; a BASELINE.json named config). There
# is no landmark ground truth, so scoring is detection coverage + temporal
# stability + crop plausibility — the properties the mouth-ROI pipeline
# actually needs from a detector on real faces.

EXAMPLE_MP4 = "/root/reference/datasets/example.mp4"


def score_real_video(provider, path=EXAMPLE_MP4, max_frames=None) -> dict:
    """Provider quality on a real video without GT:
      detected        frames with landmarks / total
      center_jump_rel per-frame face-center jump / face width (p50, p95) —
                      real head motion at 25 fps is a few % of face width;
                      detector jitter shows up as a heavy p95
      width_cv        coefficient of variation of the box width (scale
                      stability; the face neither approaches nor recedes
                      much in a talking-head clip)
      mouth_in_box    fraction of frames whose mouth center lies in the
                      lower half of the face box (geometric sanity)
      box_sane        fraction of frames with 0.1 <= box_w/frame_w <= 0.95
    """
    from lip2speech_tpu.data.video_io import load_video_gray

    frames = load_video_gray(path)
    if max_frames:
        frames = frames[:max_frames]
    lms = provider(frames)
    n = len(frames)
    fw = frames.shape[2]

    centers, widths, mouth_ok, sane = [], [], 0, 0
    detected = 0
    for lm in lms:
        if lm is None:
            centers.append(None)
            continue
        detected += 1
        x0, y0 = lm[:, 0].min(), lm[:, 1].min()
        x1, y1 = lm[:, 0].max(), lm[:, 1].max()
        w = x1 - x0
        centers.append(((x0 + x1) / 2, (y0 + y1) / 2, w))
        widths.append(w)
        mouth = lm[48:68].mean(axis=0)
        if (x0 <= mouth[0] <= x1
                and y0 + 0.45 * (y1 - y0) <= mouth[1] <= y1 + 2):
            mouth_ok += 1
        if 0.1 <= w / fw <= 0.95:
            sane += 1
    jumps = []
    for a, b in zip(centers, centers[1:]):
        if a is not None and b is not None:
            jumps.append(np.hypot(b[0] - a[0], b[1] - a[1]) / max(a[2], 1.0))
    return {
        "video": path,
        "n_frames": n,
        "detected": detected,
        "detected_rate": detected / n,
        "center_jump_rel_p50": float(np.percentile(jumps, 50)) if jumps else 1.0,
        "center_jump_rel_p95": float(np.percentile(jumps, 95)) if jumps else 1.0,
        "width_cv": (float(np.std(widths) / np.mean(widths))
                     if widths else 1.0),
        "mouth_in_box_rate": mouth_ok / max(detected, 1),
        "box_sane_rate": sane / max(detected, 1),
    }
