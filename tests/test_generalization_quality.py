"""Held-out quality regression (VERDICT r3 next #3).

The generalization run — train stage-1 + stage-2 on the 10 bundled trainval
clips, evaluate on the 5 HELD-OUT test clips (never seen in training) — is
the in-image analog of the reference's unseen-test headline
(/root/reference/README.md:105-107). scripts/quality_loop.py writes the
artifact; this test locks its result.

On the metric choice: VERDICT r3 proposed asserting held-out STOI above the
random-init 0.435 "floor", but that floor turned out to be an artifact —
the random-init vocoder emits near-silence, and STOI (and the approximate
PESQ) score near-silence spuriously high (measured init: STOI 0.434,
PESQ 3.66 — while ESTOI, the robust variant, is ~0.02). The metrics that
actually measure transfer are held-out unit accuracy / NLL, mel L1, and
ESTOI; those are what this test locks (plus: every one of them must improve
from the init snapshot).

Reproduce: python scripts/quality_loop.py --train-split train+valid \
    --eval-split test --aug --snap-every 100 --out artifacts/generalization
"""

import json
from pathlib import Path

import pytest

ART = (Path(__file__).resolve().parents[1] / "artifacts" / "generalization"
       / "quality_loop.json")


def _report():
    if not ART.exists():
        pytest.skip("generalization artifact absent; run "
                    "scripts/quality_loop.py --train-split train+valid "
                    "--eval-split test --aug --out artifacts/generalization")
    return json.loads(ART.read_text())


def test_held_out_protocol_is_clean():
    rep = _report()
    assert rep["held_out"] and rep["eval_split"] == "test"
    train_ids = set(rep["train_ids"])
    eval_ids = set(rep["eval_ids"])
    assert train_ids.isdisjoint(eval_ids)
    assert all(u.startswith("trainval/") for u in train_ids)
    assert all(u.startswith("test/") for u in eval_ids)


def test_held_out_metrics_beat_random_init():
    rep = _report()
    snaps = rep["snapshots"]
    init, final = snaps[0], snaps[-1]
    assert init["s1_step"] == 0

    # units: well above the init model (and ~10x the 1/200 chance rate)
    assert final["unit_accuracy"] >= max(2.5 * init["unit_accuracy"], 0.03), \
        (init, final)
    assert final["unit_nll"] < init["unit_nll"], (init, final)
    # predicted mel tracks the held-out ground truth far better than init
    assert final["mel_l1"] <= 0.6 * init["mel_l1"], (init, final)
    # intelligibility (the robust variant): improved over init
    assert final["estoi"] > max(init["estoi"], 0.0), (init, final)


def test_checkpoint_selection_beats_or_matches_final():
    """VERDICT r4 next #5: the protocol selects the snapshot by held-out
    ESTOI (the reference's best_checkpoint_metric practice,
    conf/lrs3/multi_target.yaml:12-17) instead of blindly shipping the
    final step. Selection can only help: best-by-ESTOI >= final."""
    rep = _report()
    trained = [s for s in rep["snapshots"] if s["s1_step"] > 0]
    assert trained, rep["snapshots"]
    best = max(trained, key=lambda s: (s["estoi"], s["unit_accuracy"]))
    final = max(trained, key=lambda s: (s["s1_step"], s["s2_step"]))
    assert best["estoi"] >= final["estoi"]
    sel = rep.get("selected")
    if sel is not None:   # artifact written by the post-r4 quality_loop
        assert sel["metric"] == "estoi"
        assert sel["best"]["estoi"] == best["estoi"], (sel["best"], best)
        assert sel["best"]["estoi"] >= sel["final"]["estoi"]