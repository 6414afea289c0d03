"""Custom inner-face shape-predictor training tooling.

Rebuild of reference dlib/{generate_shape_predictor_dataset.py:12-117,
train_shape_predictor.py:18-148}: build the dlib training XML (inner-face
landmarks 27..67 = 41 points, zero-padded back to 68 at serving time) from
per-frame landmark files, and train/tune a dlib shape predictor when dlib is
installed (it is not in this image — the XML builder is pure python and the
train/tune steps are gated).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from xml.sax.saxutils import escape

import numpy as np

INNER_FACE_START = 27  # eyes + nose + mouth (reference keeps landmarks[27:])


def build_training_xml(
    samples: list[tuple[str, tuple[int, int, int, int], np.ndarray]],
    xml_output_path: str | Path,
) -> None:
    """samples: (image_path, face box (l, t, r, b), (68, 2) landmarks).

    Writes dlib's imglab XML with inner-face parts (indices renumbered 0..40
    like the reference generator)."""
    lines = ["<dataset><images>"]
    for image_path, (left, top, right, bottom), landmarks in samples:
        width, height = right - left, bottom - top
        lines.append(f"<image file='{escape(str(image_path))}'>")
        lines.append(f"<box top='{top}' left='{left}' width='{width}' height='{height}'>")
        for i, (x, y) in enumerate(np.asarray(landmarks)[INNER_FACE_START:]):
            lines.append(f"<part name='{i:02d}' x='{int(x)}' y='{int(y)}'/>")
        lines.append("</box></image>")
    lines.append("</images></dataset>")
    Path(xml_output_path).write_text("\n".join(lines) + "\n")


def pad_inner_to_68(inner: np.ndarray) -> np.ndarray:
    """Serving-time padding: a custom inner-face predictor outputs 41 points;
    pad jaw/brow slots with zeros to keep the 68-pt interface
    (face_landmarks_server.py custom-predictor path)."""
    out = np.zeros((68, 2), inner.dtype)
    out[INNER_FACE_START:] = inner
    return out


def train(xml_path: str, output_path: str, **params) -> bool:
    """dlib.train_shape_predictor wrapper; returns False when dlib is absent."""
    try:
        import dlib

        # a bare directory named dlib on sys.path imports as an attribute-less
        # namespace package — treat that as "absent" too
        if not hasattr(dlib, "shape_predictor_training_options"):
            return False
    except ImportError:
        return False
    options = dlib.shape_predictor_training_options()
    options.tree_depth = params.get("tree_depth", 4)
    options.nu = params.get("nu", 0.1)
    options.cascade_depth = params.get("cascade_depth", 15)
    options.oversampling_amount = params.get("oversampling_amount", 20)
    options.num_threads = params.get("num_threads", 4)
    options.be_verbose = True
    dlib.train_shape_predictor(xml_path, output_path, options)
    return True


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    p_xml = sub.add_parser("generate-xml")
    p_xml.add_argument("--landmarks-dir", required=True,
                       help="dir of <id>.npy (68,2) landmark files with "
                            "matching <id>.png images and <id>.box.json")
    p_xml.add_argument("--xml-output-path", required=True)

    p_train = sub.add_parser("train")
    p_train.add_argument("--xml-path", required=True)
    p_train.add_argument("--output-path", required=True)

    args = p.parse_args()
    if args.cmd == "generate-xml":
        samples = []
        for lm_path in sorted(Path(args.landmarks_dir).glob("*.npy")):
            img = lm_path.with_suffix(".png")
            boxf = lm_path.with_suffix(".box.json")
            if not (img.exists() and boxf.exists()):
                continue
            box = tuple(json.loads(boxf.read_text()))
            samples.append((str(img), box, np.load(lm_path)))
        build_training_xml(samples, args.xml_output_path)
        print(json.dumps({"samples": len(samples)}))
    elif args.cmd == "train":
        ok = train(args.xml_path, args.output_path)
        print(json.dumps({"trained": ok,
                          "note": None if ok else "dlib not installed"}))


if __name__ == "__main__":
    main()
