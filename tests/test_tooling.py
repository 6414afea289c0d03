"""Shape-predictor XML builder + AVSpeech planner tests."""

import json
import xml.etree.ElementTree as ET

import numpy as np

from lip2speech_tpu.cli.avspeech import AVSpeechSegment, parse_csv, plan_download
from lip2speech_tpu.cli.shape_predictor import (
    build_training_xml,
    pad_inner_to_68,
    train,
)


def test_build_training_xml(tmp_path):
    rng = np.random.default_rng(0)
    lms = rng.uniform(0, 200, (68, 2))
    samples = [("/data/a.png", (10, 20, 110, 140), lms)]
    out = tmp_path / "train.xml"
    build_training_xml(samples, out)
    tree = ET.parse(out)
    images = tree.getroot().find("images")
    boxes = images[0].findall("box")
    assert len(boxes) == 1
    box = boxes[0]
    assert box.get("top") == "20" and box.get("width") == "100"
    parts = box.findall("part")
    assert len(parts) == 41  # landmarks 27..67
    assert parts[0].get("name") == "00"
    assert int(parts[0].get("x")) == int(lms[27, 0])


def test_pad_inner_to_68():
    inner = np.ones((41, 2))
    out = pad_inner_to_68(inner)
    assert out.shape == (68, 2)
    assert (out[:27] == 0).all() and (out[27:] == 1).all()


def test_train_gated():
    assert train("/nonexistent.xml", "/tmp/out.dat") is False  # dlib absent


def test_avspeech_planner(tmp_path):
    csv_path = tmp_path / "avspeech.csv"
    csv_path.write_text(
        "abc123,1.0,5.5,0.5,0.5\n"
        "def456,0.0,0.5,0.3,0.4\n"     # too short -> filtered
        "ghi789,2.0,40.0,0.5,0.5\n")   # too long -> filtered
    segs = parse_csv(csv_path)
    assert len(segs) == 3
    assert segs[0].clip_id == "abc123_1.00_5.50"
    cmds = plan_download(segs, tmp_path)
    assert len(cmds) == 1
    assert "abc123" in cmds[0] and "yt-dlp" in cmds[0]
