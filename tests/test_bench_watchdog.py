"""Watchdog semantics of bench.py's measurement subprocess runner.

The no-CPU-progress stall kill exists to heal relay-grant wedges, but a
relay-side cold compile is indistinguishable from a wedge on the client
(zero CPU while futex-waiting the RPC) — r5's flagship measurement was
stall-killed 6 straight times mid-compile, so the cache entry was never
written and every retry was identically cold. These tests pin the two
behaviors the fix depends on: stall_s honored when set, stall kill fully
disabled when stall_s=None (warm passes / escalated retries).

Runs entirely on CPU: the child command is monkeypatched to tiny
python -c stubs, no TPU or jax involved.
"""
import json
import subprocess
import sys
import time

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench  # noqa: E402


@pytest.fixture()
def fake_child(monkeypatch):
    """Replace the bench child command with an arbitrary python -c stub."""

    def install(code):
        real_popen = subprocess.Popen

        def popen(argv, **kw):
            return real_popen([sys.executable, "-c", code], **kw)

        monkeypatch.setattr(bench.subprocess, "Popen", popen)

    return install


def test_stall_kill_fires_on_zero_cpu_child(fake_child):
    fake_child("import time; time.sleep(60)")
    t0 = time.time()
    proc, err = bench._run_with_watchdog("probe", budget_s=55, stall_s=1.0)
    assert proc is None
    assert "stalled" in err
    # killed by the stall window (poll tick is 5 s), not the 55 s budget
    assert time.time() - t0 < 40


def test_stall_none_disables_the_kill(fake_child):
    # zero-CPU child + stall_s=None: only the budget may kill it
    fake_child("import time; time.sleep(60)")
    t0 = time.time()
    proc, err = bench._run_with_watchdog("probe", budget_s=8, stall_s=None)
    assert proc is None
    assert "timeout" in err and "stalled" not in err
    assert time.time() - t0 >= 8


def test_healthy_child_output_is_returned(fake_child):
    fake_child("print('x'); print('{\"ok\": 1}')")
    proc, err = bench._run_with_watchdog("probe", budget_s=30, stall_s=5.0)
    assert err is None and proc is not None
    assert json.loads(proc._bench_out.strip().splitlines()[-1]) == {"ok": 1}
