"""Shared helpers for the chip-profiling scripts.

Importing this module also puts the repo root on sys.path, so scripts can
`import _bench_util` first and then `from lip2speech_tpu...` directly.

Timing follows the axon relay rules (NOTES.md "Environment gotchas"):
median over iters of a full dispatch -> device -> host fetch, in ms; the
caller measures a trivial same-input program the same way ("relay floor")
and subtracts it to get device time.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync_time(fn, args, iters):
    np.asarray(fn(*args))                      # warmup/compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3          # ms


def flops_of(fn, args):
    try:
        return float(fn.lower(*args).compile().cost_analysis()["flops"])
    except Exception:  # noqa: BLE001
        return None


def write_artifact(name: str, payload: dict) -> str:
    """Persist a profiling result to artifacts/profile/<name>.json (VERDICT
    r4 next #4: every chip claim resolves to a committed artifact, not
    prose). Adds device kind + jax version; timestamps come from the shell
    (`date`) via payload when callers care — not Date-free but bench-free."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "artifacts", "profile")
    os.makedirs(out_dir, exist_ok=True)
    try:
        import jax

        payload = dict(payload)
        payload.setdefault("device_kind", jax.devices()[0].device_kind)
        payload.setdefault("jax_version", jax.__version__)
    except Exception:  # noqa: BLE001
        pass
    payload.setdefault("wall_clock", time.strftime("%Y-%m-%d %H:%M:%S"))
    path = os.path.join(out_dir, f"{name}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    return path
