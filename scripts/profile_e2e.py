"""Per-segment device-time profile of the serving e2e program.

Attributes the e2e video->wav call (bench.py headline shapes: conformer-only
preset, batch 4 x 240 frames, bf16 compute) to its stages:

    frontend (ResNet3D)  ->  interleave + conformer  ->  mel head
    unit head + argmax   ->  vocoder                  ->  PCM16 cast

Method (axon relay rules — NOTES.md): every sub-program is jitted separately
and returns ONE f32 scalar (sum of its outputs) so the device->host fetch is
constant-size; the per-call relay floor is measured with a trivial program on
the same shapes and subtracted. FLOPs come from XLA cost analysis, MFU from
the device-kind peak. Run on the chip:

    python scripts/profile_e2e.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from _bench_util import flops_of, sync_time  # noqa: F401 (adds repo root)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=240)
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax-bench-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

    cfg = preset("multi_target")
    pipe = Lip2SpeechPipeline.initialize_random(cfg, seed=0, frames=8)
    pipe.compute_dtype = jnp.bfloat16
    pipe.emit_int16 = True

    B, T = args_cli.batch, args_cli.frames
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((B, T, 88, 88, 1)), jnp.float32)
    # masks stay NUMPY: a device array captured as a jit constant forces a
    # lowering-time value fetch over the relay (observed FAILED_PRECONDITION
    # in profile_gan.py) — numpy closures embed without a device roundtrip
    mask = np.ones((B, T), bool)
    spk = jnp.asarray(rng.standard_normal((B, 256)), jnp.float32)

    model, vocoder = pipe.model, pipe.vocoder
    num_special = cfg.model.units.num_special

    cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    s1 = cast(pipe.stage1_variables)
    vp = cast(pipe.vocoder_params)
    video_b, spk_b = video.astype(jnp.bfloat16), spk.astype(jnp.bfloat16)

    # ---- sub-programs (each returns one f32 scalar) ----
    def scalar(x):
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def p_floor(v):
        return scalar(v[0, 0, :8, :8, 0])

    @jax.jit
    def p_frontend(s1, v):
        f = model.apply(s1, v, mask, method=MT_extract)
        return scalar(f)

    def MT_extract(m, v, fm):
        return m.extract_frontend(v, fm, train=False)

    @jax.jit
    def p_stage1(s1, v, sp):
        out = model.apply(s1, v, mask, sp, train=False)
        return scalar(out["unit_logits"]) + scalar(out["mel"])

    # conformer alone on frontend-shaped features (50 Hz, dim d)
    feats = jnp.asarray(rng.standard_normal((B, T, 512)), jnp.bfloat16)
    mask2 = np.ones((B, 2 * T), bool)    # numpy: see `mask` note above
    x50 = jnp.asarray(rng.standard_normal((B, 2 * T, cfg.model.conformer.dim)),
                      jnp.bfloat16)

    def MT_conformer(m, x, fm):
        y, _ = m.conformer(x, fm, train=False)
        return y

    @jax.jit
    def p_conformer(s1, x):
        return scalar(model.apply(s1, x, mask2, method=MT_conformer))

    def MT_melhead(m, x, sp):
        return m.mel_head(x, sp, deterministic=True)

    @jax.jit
    def p_melhead(s1, x, sp):
        return scalar(model.apply(s1, x, sp, method=MT_melhead))

    def MT_unithead(m, x):
        return m.unit_head(x, deterministic=True)

    @jax.jit
    def p_unithead(s1, x):
        logits = model.apply(s1, x, method=MT_unithead)
        units = jnp.argmax(logits[..., num_special:], axis=-1)
        return scalar(units.astype(jnp.float32))

    code = jnp.asarray(rng.integers(0, 200, (B, 2 * T)), jnp.int32)
    melc = jnp.asarray(rng.standard_normal((B, 4 * T, 80)), jnp.bfloat16)

    @jax.jit
    def p_vocoder(vp, c, m, sp):
        wav = vocoder.apply({"params": vp}, c, m, sp, deterministic=True)
        return scalar(wav)

    @jax.jit
    def p_e2e_scalar(s1, vp, v, sp):
        out = model.apply(s1, v, mask, sp, train=False)
        units = jnp.argmax(out["unit_logits"][..., num_special:], axis=-1)
        units = jnp.where(out["mask"], units, 0)
        wav = vocoder.apply({"params": vp}, units.astype(jnp.int32),
                            out["mel"], sp, deterministic=True)
        return scalar(wav)

    peak = 197e12  # v5e bf16; profile is relative anyway
    kind = jax.devices()[0].device_kind.lower()
    for s, p in [("v6", 918e12), ("v5p", 459e12), ("v4", 275e12)]:
        if s in kind:
            peak = p

    floor = sync_time(p_floor, (video_b,), args_cli.iters)
    rows = []

    def run(name, fn, a):
        ms = sync_time(fn, a, args_cli.iters)
        fl = flops_of(fn, a)
        dev_ms = max(0.0, ms - floor)
        mfu = (fl / (dev_ms / 1e3) / peak * 100.0) if fl and dev_ms > 0 else None
        rows.append({"segment": name, "wall_ms": round(ms, 2),
                     "dev_ms": round(dev_ms, 2),
                     "gflops": round(fl / 1e9, 1) if fl else None,
                     "mfu_pct": round(mfu, 2) if mfu else None})

    run("e2e(scalar-fetch)", p_e2e_scalar, (s1, vp, video_b, spk_b))
    run("stage1 full", p_stage1, (s1, video_b, spk_b))
    run("frontend resnet3d", p_frontend, (s1, video_b))
    run("conformer x12", p_conformer, (s1, x50))
    run("mel head", p_melhead, (s1, x50, spk_b))
    run("unit head+argmax", p_unithead, (s1, x50))
    run("vocoder", p_vocoder, (vp, code, melc, spk_b))

    # the pipeline's real fn (includes wav transfer to host)
    fn_full = pipe._jitted(None)
    full_args = (pipe.stage1_variables, pipe.vocoder_params, video, mask, spk)
    np.asarray(fn_full(*full_args)[0])
    ts = []
    for _ in range(args_cli.iters):
        t0 = time.perf_counter()
        np.asarray(fn_full(*full_args)[0])
        ts.append(time.perf_counter() - t0)
    rows.append({"segment": "e2e(pipeline, wav fetch)",
                 "wall_ms": round(float(np.median(ts)) * 1e3, 2),
                 "dev_ms": None, "gflops": None, "mfu_pct": None})

    payload = {"floor_ms": round(floor, 2), "batch": B, "frames": T,
               "device": kind, "rows": rows}
    print(json.dumps(payload, indent=1))
    from _bench_util import write_artifact
    print("wrote", write_artifact("e2e_segments", payload))


if __name__ == "__main__":
    main()
