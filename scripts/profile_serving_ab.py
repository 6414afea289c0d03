"""Serving e2e A/B: {plain, flash, fused, fused+flash} x two passes.

Decides whether flash rel-attention stays ON for the SERVING path (VERDICT
r4 next #6): the r4 chip probe showed flash is a wash at inference shapes
(plain 414 vs flash-only 397; fused-only 475 vs fused+flash 488), so the
decision needs record-grade evidence — each config measured in its own
subprocess-free pass, median + spread, TWO interleaved passes so a relay
weather window cannot crown a config, artifact committed.

Run on the chip:  python scripts/profile_serving_ab.py [--iters 12]
Writes artifacts/profile/serving_ab.json.
"""

from __future__ import annotations

import argparse

import numpy as np

from _bench_util import write_artifact  # noqa: F401 (adds repo root)

CONFIGS = [
    ("plain", dict(fused=False, flash=False)),
    ("flash", dict(fused=False, flash=True)),
    ("fused", dict(fused=True, flash=False)),
    ("fused_flash", dict(fused=True, flash=True)),
]


def build(batch, frames, fused, flash):
    import jax
    import jax.numpy as jnp

    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

    pipe = Lip2SpeechPipeline.initialize_random(
        preset("multi_target"), seed=0, frames=8,
        fused_tail=fused, use_flash=flash)
    pipe.compute_dtype = jnp.bfloat16
    pipe.emit_int16 = True
    rng = np.random.default_rng(0)
    video = rng.standard_normal((batch, frames, 88, 88, 1)).astype(np.float32)
    mask = np.ones((batch, frames), bool)
    spk = rng.standard_normal((batch, 256)).astype(np.float32)
    fn = pipe._jitted(None)
    args = (pipe.stage1_variables, pipe.vocoder_params,
            jax.numpy.asarray(video), jax.numpy.asarray(mask),
            jax.numpy.asarray(spk))
    return fn, args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=240)
    cli = ap.parse_args()

    import time

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax-bench-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    audio_s = cli.batch * cli.frames / 25.0
    built = {}
    for name, kw in CONFIGS:
        built[name] = build(cli.batch, cli.frames, **kw)
        np.asarray(built[name][0](*built[name][1])[0])   # compile+warm
        print(f"compiled {name}", flush=True)

    result = {"batch": cli.batch, "frames": cli.frames, "iters": cli.iters,
              "passes": {}}
    # two interleaved passes: config order rotates so a slow relay window
    # hits different configs in each pass
    for p in range(2):
        times = {n: [] for n, _ in CONFIGS}
        order = [n for n, _ in CONFIGS]
        if p == 1:
            order = order[::-1]
        for _ in range(cli.iters):
            for n in order:
                fn, args = built[n]
                t0 = time.perf_counter()
                np.asarray(fn(*args)[0])
                times[n].append(time.perf_counter() - t0)
        result["passes"][f"pass{p}"] = {
            n: {"rtf_p50": round(audio_s / float(np.median(ts)), 1),
                "spread_pct": round(float(
                    (np.percentile(ts, 90) - np.percentile(ts, 10))
                    / np.median(ts) * 100.0), 1)}
            for n, ts in times.items()}
        print(f"pass{p}: " + " ".join(
            f"{n}={result['passes'][f'pass{p}'][n]['rtf_p50']}x"
            for n, _ in CONFIGS), flush=True)

    # decision summary: flash delta at the shipped (fused) serving config
    p0, p1 = result["passes"]["pass0"], result["passes"]["pass1"]
    for k in ("fused", "fused_flash", "plain", "flash"):
        result[f"{k}_rtf_mean_of_passes"] = round(
            0.5 * (p0[k]["rtf_p50"] + p1[k]["rtf_p50"]), 1)
    ff, f = (result["fused_flash_rtf_mean_of_passes"],
             result["fused_rtf_mean_of_passes"])
    result["flash_serving_gain_pct"] = round((ff - f) / f * 100.0, 2)
    path = write_artifact("serving_ab", result)
    print(f"wrote {path}")
    print(f"flash gain at fused serving config: "
          f"{result['flash_serving_gain_pct']}%")


if __name__ == "__main__":
    main()
