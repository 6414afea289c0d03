"""Held-out quality regression (VERDICT r3 next #3).

The generalization run — train stage-1 + stage-2 on the 10 bundled trainval
clips, evaluate on the 5 HELD-OUT test clips (never seen in training) — is
the in-image analog of the reference's unseen-test headline
(/root/reference/README.md:105-107). scripts/quality_loop.py writes the
artifact; this test locks its result: held-out STOI must beat the
random-init floor and must improve over the init snapshot.

Reproduce: python scripts/quality_loop.py --train-split train+valid \
    --eval-split test --out artifacts/generalization
"""

import json
from pathlib import Path

import pytest

ART = (Path(__file__).resolve().parents[1] / "artifacts" / "generalization"
       / "quality_loop.json")

# random-init pipeline STOI on the 5 test clips (QUALITY.md r3 measurement)
RANDOM_INIT_STOI_FLOOR = 0.435


def _report():
    if not ART.exists():
        pytest.skip("generalization artifact absent; run "
                    "scripts/quality_loop.py --train-split train+valid "
                    "--eval-split test --out artifacts/generalization")
    return json.loads(ART.read_text())


def test_held_out_protocol_is_clean():
    rep = _report()
    assert rep["held_out"] and rep["eval_split"] == "test"
    train_ids = set(rep["train_ids"])
    eval_ids = set(rep["eval_ids"])
    assert train_ids.isdisjoint(eval_ids)
    assert all(u.startswith("trainval/") for u in train_ids)
    assert all(u.startswith("test/") for u in eval_ids)


def test_held_out_stoi_beats_random_floor():
    rep = _report()
    snaps = rep["snapshots"]
    final = snaps[-1]
    assert final["stoi"] > RANDOM_INIT_STOI_FLOOR, (
        f"held-out STOI {final['stoi']:.3f} does not beat the random-init "
        f"floor {RANDOM_INIT_STOI_FLOOR}")
    # training must have improved held-out quality over the init snapshot
    assert final["stoi"] > snaps[0]["stoi"]
