"""Emit the landmark-benchmark table for QUALITY.md (VERDICT r2 next #5)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

import numpy as np  # noqa: E402

from landmark_bench import ENVELOPE_SCENARIOS, run_all  # noqa: E402


def main():
    rows = run_all()
    print("| scenario | box IoU | crop IoU | center err (px) | center err "
          "(rel. face width) | frames detected |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['scenario']} | {r['box_iou']:.3f} | {r['crop_iou']:.3f} "
              f"| {r['center_err_px']:.1f} | {r['center_err_rel']:.3f} "
              f"| {r['detected_frames']}/{r['n_frames']} |")
    env = [r for r in rows if r["scenario"] in ENVELOPE_SCENARIOS]
    print(f"| **mean (envelope)** "
          f"| **{np.mean([r['box_iou'] for r in env]):.3f}** "
          f"| **{np.mean([r['crop_iou'] for r in env]):.3f}** | | | |")
    print(f"| **mean (all incl. non-frontal/tiny)** "
          f"| **{np.mean([r['box_iou'] for r in rows]):.3f}** "
          f"| **{np.mean([r['crop_iou'] for r in rows]):.3f}** | | | |")


if __name__ == "__main__":
    main()
