"""Capacity probe: grow a synthetic clip until synthesis fails or the cap.

Rebuild of reference find_max_duration.py:10-42 (probes the GPU decoder's
duration limit with a constant-frame video). On TPU the limit is HBM-bound;
this reports the largest bucket that compiles + runs and its latency.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="multi_target")
    p.add_argument("--max-seconds", type=float, default=24.0)
    p.add_argument("--step-seconds", type=float, default=4.0)
    args = p.parse_args()

    import jax.numpy as jnp

    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

    cfg = preset(args.preset)
    pipe = Lip2SpeechPipeline.initialize_random(cfg, frames=8)
    fn = pipe._jitted(None)

    results = []
    secs = args.step_seconds
    while secs <= args.max_seconds + 1e-6:
        frames = int(secs * 25)
        video = jnp.zeros((1, frames, 88, 88, 1), jnp.float32)
        mask = jnp.ones((1, frames), bool)
        spk = jnp.zeros((1, 256), jnp.float32)
        try:
            wav = np.asarray(fn(pipe.stage1_variables, pipe.vocoder_params,
                                video, mask, spk)[0])   # compile + run
            t0 = time.perf_counter()
            wav = np.asarray(fn(pipe.stage1_variables, pipe.vocoder_params,
                                video, mask, spk)[0])
            dt = time.perf_counter() - t0
            results.append({"seconds": secs, "frames": frames, "ok": True,
                            "latency_ms": round(dt * 1000, 1),
                            "rtf": round(secs / dt, 1)})
        except Exception as e:
            results.append({"seconds": secs, "ok": False, "error": str(e)[:200]})
            break
        secs += args.step_seconds

    ok = [r for r in results if r.get("ok")]
    print(json.dumps({"max_ok_seconds": ok[-1]["seconds"] if ok else 0,
                      "probes": results}))


if __name__ == "__main__":
    main()
