"""In-tree ERT shape-predictor training (reference parity:
dlib/train_shape_predictor.py:18-63 + generate_shape_predictor_dataset.py —
dlib is absent in this image, so pipeline/ert.py implements the same
Kazemi-Sullivan cascade the dlib trainer runs; these tests prove it actually
learns, round-trips, and consumes the reference's imglab-XML workflow)."""

import json
from pathlib import Path

import numpy as np
import pytest

from landmark_bench import render_face_dataset
from lip2speech_tpu.pipeline.ert import (
    ErtModel, ErtOptions, evaluate_error, load_imglab_xml, train_ert, train_from_xml)

FAST = ErtOptions(cascade_depth=5, trees_per_cascade=50,
                  feature_pool_size=120, tree_depth=3, num_test_splits=12,
                  oversampling_amount=6, oversampling_translation_jitter=0.08,
                  nu=0.12, seed=0)


@pytest.fixture(scope="module")
def dataset():
    samples = render_face_dataset(n=44, seed=0)
    return samples[:36], samples[36:]


@pytest.fixture(scope="module")
def trained(dataset):
    train, _test = dataset
    return train_ert(train, FAST)


def test_learns_far_beyond_mean_shape(dataset, trained):
    """Held-out normalized landmark error must beat the mean-shape-in-box
    baseline by a wide margin — the property dlib.test_shape_predictor
    gates on (train_shape_predictor.py:55-63)."""
    train, test = dataset
    baseline = train_ert(train, ErtOptions(cascade_depth=0,
                                           oversampling_amount=1))
    b = evaluate_error(baseline, test)
    e = evaluate_error(trained, test)
    assert b > 0.04           # the baseline is genuinely bad on varied poses
    assert e < 0.45 * b       # measured: ~0.10-0.25x depending on budget
    assert e < 0.03           # < 3% of face width per landmark


def test_prediction_tracks_pose(dataset, trained):
    """Predictions must track the face's actual yaw/roll, not just the box:
    per-image predicted mouth center lands near GT even as pose varies."""
    _train, test = dataset
    for image, box, gt in test:
        pred = trained.predict(image, box)
        err = np.linalg.norm(pred[48:68].mean(0) - gt[48:68].mean(0))
        assert err < 0.08 * (box[2] - box[0])


def test_serialization_roundtrip(tmp_path, dataset, trained):
    _train, test = dataset
    p = tmp_path / "ert_model.npz"
    trained.save(p)
    loaded = ErtModel.load(p)
    image, box, _gt = test[0]
    np.testing.assert_allclose(loaded.predict(image, box),
                               trained.predict(image, box))


def test_xml_workflow_end_to_end(tmp_path):
    """The full reference workflow without dlib: per-frame landmark files ->
    build_training_xml (cli/shape_predictor.py) -> train_from_xml -> model
    file -> predictions. Inner-face slice (27:) like the reference's
    generator (generate_shape_predictor_dataset.py:12-117)."""
    from lip2speech_tpu.cli.shape_predictor import build_training_xml

    samples = render_face_dataset(n=10, seed=3)
    xml_samples = []
    for i, (image, box, lm) in enumerate(samples):
        img_path = tmp_path / f"f{i:03d}.npy"
        np.save(img_path, image)
        l, t, r, b = (int(round(v)) for v in box)
        xml_samples.append((str(img_path), (l, t, r, b), lm))
    xml_path = tmp_path / "train.xml"
    build_training_xml(xml_samples, xml_path)

    parsed = load_imglab_xml(xml_path)
    assert len(parsed) == 10
    assert parsed[0][2].shape == (41, 2)    # inner-face 27..67

    model_path = tmp_path / "predictor.npz"
    tiny = ErtOptions(cascade_depth=3, trees_per_cascade=25,
                      feature_pool_size=80, tree_depth=3, num_test_splits=8,
                      oversampling_amount=4, nu=0.15)
    model = train_from_xml(xml_path, model_path, tiny)
    assert model_path.exists()
    img, box, _ = parsed[0]
    pred = model.predict(np.load(img), box)
    assert pred.shape == (41, 2)


def test_ert_landmarks_provider(tmp_path, dataset, trained, monkeypatch):
    """ErtLandmarks (detector box -> trained predictor, the reference's
    custom-predictor serving path) refines a video's landmarks; the
    LIP2SPEECH_ERT_PREDICTOR env var switches default_landmarker to it."""
    from landmark_bench import render_video

    from lip2speech_tpu.pipeline import landmarks as lmk

    model_path = tmp_path / "pred.npz"
    trained.save(model_path)

    frames, boxes, mouths, _gt = render_video(t=6, seed=11,
                                              return_landmarks=True)
    provider = lmk.ErtLandmarks(str(model_path),
                                box_provider=lmk.HeuristicLandmarks())
    out = provider(frames)
    assert len(out) == 6
    for lm, (mx, my), box in zip(out, mouths, boxes):
        assert lm is not None and lm.shape == (68, 2)
        c = lm[48:68].mean(0)
        assert np.hypot(c[0] - mx, c[1] - my) < 0.12 * (box[2] - box[0])

    monkeypatch.setenv("LIP2SPEECH_ERT_PREDICTOR", str(model_path))
    assert isinstance(lmk.default_landmarker(), lmk.ErtLandmarks)
    monkeypatch.delenv("LIP2SPEECH_ERT_PREDICTOR")
    assert not isinstance(lmk.default_landmarker(), lmk.ErtLandmarks)


def test_cli_train_uses_in_tree_trainer(tmp_path, capsys):
    """cli/shape_predictor.py train must fall back to the in-tree ERT when
    dlib is absent instead of reporting 'not installed'."""
    import sys

    from lip2speech_tpu.cli import shape_predictor as sp

    samples = render_face_dataset(n=8, seed=5)
    lm_dir = tmp_path / "lms"
    lm_dir.mkdir()
    for i, (image, box, lm) in enumerate(samples):
        np.save(lm_dir / f"f{i:03d}.npy",
                np.concatenate([np.zeros((27, 2)), lm[27:]]) if lm.shape[0] == 68
                else lm)
        np.save(str(lm_dir / f"f{i:03d}.img.npy"), image)
        (lm_dir / f"f{i:03d}.box.json").write_text(
            json.dumps([int(round(v)) for v in box]))
    xml_path = tmp_path / "train.xml"
    argv = ["prog", "generate-xml", "--landmarks-dir", str(lm_dir),
            "--image-suffix", ".img.npy",
            "--xml-output-path", str(xml_path)]
    old = sys.argv
    try:
        sys.argv = argv
        sp.main()
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["samples"] == 8
        model_path = tmp_path / "model.npz"
        sys.argv = ["prog", "train", "--xml-path", str(xml_path),
                    "--output-path", str(model_path), "--preset", "tiny"]
        sp.main()
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["trained"]
        assert out["backend"] == "ert"
        assert model_path.exists()
    finally:
        sys.argv = old
