"""Capacity probe CLI smoke test (tiny preset, CPU)."""

import json
import sys


def test_find_max_duration_cli(monkeypatch, capsys):
    from lip2speech_tpu.cli.find_max_duration import main

    monkeypatch.setattr(sys, "argv", [
        "probe", "--preset", "tiny",
        "--max-seconds", "4", "--step-seconds", "2"])
    main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["max_ok_seconds"] == 4
    assert all(p["ok"] for p in out["probes"])
    assert all(p["rtf"] > 0 for p in out["probes"])
