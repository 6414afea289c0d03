"""Train the default-preset ERT shape predictor on the synthetic face set
and score it on the landmark benchmark + the real example.mp4 — the
committed evidence for the QUALITY.md ERT rows (artifact:
artifacts/profile/ert_landmarks.json)."""

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # pure-CPU report: never touch
#                                             the TPU relay for a stamp

import numpy as np  # noqa: E402

from landmark_bench import (ENVELOPE_SCENARIOS, render_face_dataset,  # noqa: E402
                            run_all, score_real_video)
from lip2speech_tpu.cli.shape_predictor import PRESETS  # noqa: E402
from lip2speech_tpu.pipeline import landmarks as lmk  # noqa: E402
from lip2speech_tpu.pipeline.ert import (ErtOptions, evaluate_error,  # noqa: E402
                                         train_ert)
from _bench_util import write_artifact  # noqa: E402


def main():
    t0 = time.time()
    samples = render_face_dataset(n=72, seed=0)
    train, test = samples[:60], samples[60:]
    opt = ErtOptions(**PRESETS["default"])
    model = train_ert(train, opt)
    err = evaluate_error(model, test)
    baseline = evaluate_error(train_ert(train, ErtOptions(
        cascade_depth=0, oversampling_amount=1)), test)
    train_s = time.time() - t0

    model_path = Path(tempfile.gettempdir()) / "ert_default.npz"
    model.save(model_path)
    prov = lmk.ErtLandmarks(str(model_path),
                            box_provider=lmk.HeuristicLandmarks())
    rows = run_all(provider=prov)
    env = [r for r in rows if r["scenario"] in ENVELOPE_SCENARIOS]
    out = {
        "train_s": round(train_s, 1),
        "heldout_err_rel_face_width": round(err, 5),
        "mean_shape_baseline_err": round(baseline, 5),
        "scenarios": rows,
        "env_mean_crop_iou": round(float(np.mean(
            [r["crop_iou"] for r in env])), 3),
        "all_mean_crop_iou": round(float(np.mean(
            [r["crop_iou"] for r in rows])), 3),
        "model_size_kb": round(model_path.stat().st_size / 1024, 1),
    }
    try:
        out["real_video"] = score_real_video(prov)
    except Exception as e:  # noqa: BLE001 — example.mp4 needs a decode backend
        out["real_video"] = f"error: {e}"
    print(json.dumps(out, indent=2))
    write_artifact("ert_landmarks", out)


if __name__ == "__main__":
    main()
