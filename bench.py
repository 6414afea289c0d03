"""Benchmark: end-to-end video->waveform real-time factor on one TPU chip.

Prints ONE JSON line. Headline metric (driver contract): end-to-end
synthesis RTF (seconds of audio generated per wall-clock second) for the
full jitted video->units+mel->vocoder->wav program on the conformer-only
preset; vs_baseline is RTF / 5.0 (BASELINE.json: >=5x real time per chip).

The `details` field widens the artifact (VERDICT r1 next #6, r2 next #2/#10):
  flagship_rtf           same e2e RTF for the AV-HuBERT flagship preset
  flagship_mfu_pct       flagship co-headline MFU (r2 next #10)
  batch1_p50_ms          single-clip (9.6 s) p50 serving latency
  stage1_train_step_ms   multi_target train step (B=2, T=240, recipe dropout)
  stage1_recipe_step_ms  the REFERENCE operating point: 600-frame bucket,
                         max_tokens 3600 => B=6, update_freq 8, attention
                         dropout 0.1 (conf/lrs3/multi_target.yaml:38-66);
                         flash attention verified active via pallas_call in
                         the lowered step (stage1_flash_active)
  stage1_train_mfu_pct   recipe-step model FLOPs / wall / chip peak
  stage2_train_step_ms   vocoder GAN step (B=8, 8960-sample segments)
  stage2_train_mfu_pct   GAN-step MFU
  mfu_pct                serving e2e MFU (XLA cost analysis)

Every detail is best-effort: a failure records the error string instead of
breaking the one-line contract. Timing always syncs via a device->host
transfer (block_until_ready returns early under the axon relay).
"""

import dataclasses
import json
import time

import numpy as np

# bf16 peak TFLOP/s per chip by device kind (first substring match wins)
PEAK_TFLOPS = [("v6", 918.0), ("v5p", 459.0), ("v5", 197.0), ("v4", 275.0)]


def _sync_time(fn, args, iters, fetch=lambda out: out[0]):
    _ = np.asarray(fetch(fn(*args)))           # warmup / compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fetch(fn(*args)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), float(np.mean(times))


def _time_train_steps(step, state, batch, key, iters):
    """Train steps donate their input state (donate_argnums=(0,)), so the
    returned state must be threaded through — re-calling with the donated
    original reads deleted buffers."""
    state, logs = step(state, batch, key)
    _ = np.asarray(logs["loss"] if "loss" in logs else logs["loss_gen"])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, logs = step(state, batch, key)
        np.asarray(logs["loss"] if "loss" in logs else logs["loss_gen"])
        times.append(time.perf_counter() - t0)
    return float(np.mean(times))


def _step_cost_flops(step, state, batch, key):
    """FLOPs of a compiled train step (XLA cost analysis); None on failure."""
    try:
        compiled = step.lower(state, batch, key).compile()
        return float(compiled.cost_analysis()["flops"])
    except Exception:  # noqa: BLE001
        return None


def _peak_flops():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    return next((p for s, p in PEAK_TFLOPS if s in kind), 197.0) * 1e12


def _e2e(pipe_cfg_name, batch, frames, iters, fused=False):
    import jax
    import jax.numpy as jnp

    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

    cfg = preset(pipe_cfg_name)
    # NOTE: VocoderConfig.mxu_fold stays OFF — the exact lane-packing
    # reformulation measured 4-6x SLOWER on the chip (NOTES r3: XLA
    # materializes the patch construction instead of fusing it)
    # fused=True: VMEM-fused resblock trios (ops/pallas_fused_tail.py);
    # main() falls back to fused=False if compile fails on the chip. The
    # explicit fused_tail=... override matters: the pipeline AUTO-enables
    # the kernel on TPU, so the fallback must force it off.
    pipe = Lip2SpeechPipeline.initialize_random(cfg, seed=0, frames=8,
                                                fused_tail=fused)
    # serving configuration: bf16 compute + device-side PCM16 output
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
    p50, mean = _sync_time(fn, args, iters)
    rtf = (batch * frames / 25.0) / mean
    return rtf, p50, fn, args


def _stage1_batch(accum, b, t, rng, uint8=False):
    if uint8:
        video = rng.integers(0, 256, (accum, b, t, 88, 88, 1)).astype(np.uint8)
    else:
        video = rng.standard_normal((accum, b, t, 88, 88, 1)).astype(np.float32)
    return {
        "video": video,
        "frames_mask": np.ones((accum, b, t), bool),
        "spk_emb": rng.standard_normal((accum, b, 256)).astype(np.float32),
        "unit_tokens": rng.integers(4, 204, (accum, b, 2 * t)).astype(np.int32),
        "mel": rng.standard_normal((accum, b, 4 * t, 80)).astype(np.float32),
    }


def _stage1_step_setup(accum, b, t, check_flash=False, uint8=False,
                       bf16=False):
    """multi_target train step at the RECIPE dropout (attention_dropout 0.1):
    the flash kernel handles in-kernel PRNG dropout on TPU (NOTES r2 §3), so
    no dropout gymnastics are needed — but verify pallas_call is actually in
    the lowered step rather than assuming."""
    import jax

    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.train import stage1

    cfg = preset("multi_target")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, conformer=dataclasses.replace(
                cfg.model.conformer, use_flash=True)),
        stage1=dataclasses.replace(cfg.stage1, bf16_compute=bf16))
    rng = np.random.default_rng(1)
    batch = _stage1_batch(accum, b, t, rng, uint8=uint8)
    micro0 = {k: v[0] for k, v in batch.items()}
    model, tx, state = stage1.create_train_state(cfg, jax.random.PRNGKey(0), micro0)
    step = stage1.make_train_step(model, tx, cfg)
    flash_active = check_flash and "pallas_call" in str(
        jax.make_jaxpr(lambda s, bt, k: step.__wrapped__(s, bt, k))(
            state, batch, jax.random.PRNGKey(1)))
    return step, state, batch, flash_active


def _train_step_stage1(iters=5):
    import jax

    step, state, batch, _ = _stage1_step_setup(1, 2, 240)
    return _time_train_steps(step, state, batch, jax.random.PRNGKey(1),
                             iters) * 1e3


def _train_step_stage1_recipe(details, iters=3):
    """The reference operating point: 600-frame bucket, max_tokens 3600 =>
    6 clips/micro, update_freq 8 (conf/lrs3/multi_target.yaml:38-66).

    Video ships uint8 (the production wire format — see NOTES r3: the train
    step is host->device bandwidth-bound over the relay, and 4x smaller
    transfers matter on PCIe too); the step dequantizes on device. The step
    time is measured with a DEVICE-RESIDENT batch (steady-state training
    overlaps transfers via data/prefetch.py); the transfer-inclusive
    cold number is reported separately. The b=6 micro-batch occasionally
    exceeds the relay compile helper's limits — falls back to b=3 (half the
    reference tokens/update) and records which ran."""
    import jax

    last_err = None
    for b in (6, 3):
        try:
            step, state, batch, flash_active = _stage1_step_setup(
                8, b, 600, check_flash=True, uint8=True)
            batch_dev = jax.device_put(batch)
            details["stage1_flash_active"] = bool(flash_active)
            details["stage1_recipe_config"] = f"accum8 x b{b} x T600 uint8"
            # XLA cost analysis counts the accum lax.scan body ONCE — scale
            # by update_freq or the MFU under-reports 8x (measured: the
            # accum-1 step's flops = exactly 1/8 of the real accum-8 work)
            flops = _step_cost_flops(step, state, batch_dev,
                                     jax.random.PRNGKey(1))
            if flops:
                flops *= 8
            # transfer-inclusive cold call first (also the warmup/compile)
            import time as _time

            state, logs = step(state, batch, jax.random.PRNGKey(1))
            np.asarray(logs["loss"])
            t0 = _time.perf_counter()
            state, logs = step(state, batch, jax.random.PRNGKey(1))
            np.asarray(logs["loss"])
            details["stage1_recipe_with_transfer_ms"] = round(
                (_time.perf_counter() - t0) * 1e3, 1)
            mean_s = _time_train_steps(step, state, batch_dev,
                                       jax.random.PRNGKey(1), iters)
            details["stage1_recipe_step_ms"] = round(mean_s * 1e3, 1)
            if flops:
                details["stage1_train_mfu_pct"] = round(
                    flops / mean_s / _peak_flops() * 100.0, 2)
            # bf16 mixed-precision training (beyond-reference flag)
            try:
                step_h, state_h, batch_h, _ = _stage1_step_setup(
                    8, b, 600, uint8=True, bf16=True)
                batch_h = jax.device_put(batch_h)
                mean_h = _time_train_steps(step_h, state_h, batch_h,
                                           jax.random.PRNGKey(1), iters)
                details["stage1_recipe_bf16_ms"] = round(mean_h * 1e3, 1)
            except Exception as e:  # noqa: BLE001
                details["stage1_recipe_bf16_ms"] = f"error: {e}"
            return
        except Exception as e:  # noqa: BLE001
            last_err = e
    details["stage1_recipe_step_ms"] = f"error: {last_err}"


def _train_step_stage2(details, iters=5):
    import jax

    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.train import stage2

    cfg = preset("multi_target")
    seg = cfg.vocoder.segment_size
    b = 8
    rng = np.random.default_rng(2)
    batch = {
        "code": rng.integers(0, 200, (b, seg // 320)).astype(np.int32),
        "mel": rng.standard_normal((b, seg // 160, 80)).astype(np.float32),
        "spk_emb": rng.standard_normal((b, 256)).astype(np.float32),
        "audio": (0.1 * rng.standard_normal((b, seg))).astype(np.float32),
    }
    models, txs, state = stage2.create_gan_state(cfg, jax.random.PRNGKey(0), batch)
    step = stage2.make_gan_step(models, txs, cfg)
    flops = _step_cost_flops(step, state, batch, jax.random.PRNGKey(3))
    mean_s = _time_train_steps(step, state, batch, jax.random.PRNGKey(3), iters)
    if flops:
        details["stage2_train_mfu_pct"] = round(
            flops / mean_s / _peak_flops() * 100.0, 2)
    return mean_s * 1e3


def main():
    import jax

    # compiles over the axon relay are slow; persist them across bench runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax-bench-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # keep the ONE-JSON-line contract even when the TPU relay is down
    # (observed: multi-hour axon outages raise at first device access)
    try:
        jax.devices()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({
            "metric": "e2e_video_to_wav_rtf", "value": None,
            "unit": "x_realtime_per_chip", "vs_baseline": None,
            "error": f"TPU backend unavailable: {e}"}))
        raise SystemExit(1)

    details: dict = {}

    # headline: conformer-only preset, batch 4 x 9.6 s — fused vocoder-tail
    # Pallas kernel first, plain XLA path as the safe fallback
    fused = True
    try:
        rtf, _, fn, args = _e2e("multi_target", batch=4, frames=240,
                                iters=10, fused=True)
        details["fused_tail_kernel"] = True
    except Exception as e:  # noqa: BLE001
        fused = False
        details["fused_tail_kernel"] = f"fallback: {e}"
        rtf, _, fn, args = _e2e("multi_target", batch=4, frames=240, iters=10)

    # MFU from XLA's cost analysis of the e2e program
    try:
        compiled = fn.lower(*args).compile() if hasattr(fn, "lower") else None
        flops = float(compiled.cost_analysis()["flops"])
        wall = (4 * 240 / 25.0) / rtf
        details["mfu_pct"] = round(flops / wall / _peak_flops() * 100.0, 2)
        details["e2e_gflops_per_call"] = round(flops / 1e9, 1)
    except Exception as e:  # noqa: BLE001
        details["mfu_pct"] = f"error: {e}"

    # single-clip serving latency
    try:
        _, p50, _, _ = _e2e("multi_target", batch=1, frames=240, iters=15,
                            fused=fused)
        details["batch1_p50_ms"] = round(p50 * 1e3, 1)
    except Exception as e:  # noqa: BLE001
        details["batch1_p50_ms"] = f"error: {e}"

    # flagship AV-HuBERT frontend (co-headline, r2 next #10)
    try:
        frtf, _, ffn, fargs = _e2e("multi_target_avhubert", batch=4,
                                   frames=240, iters=5, fused=fused)
        details["flagship_rtf"] = round(frtf, 1)
        fcompiled = ffn.lower(*fargs).compile()
        fflops = float(fcompiled.cost_analysis()["flops"])
        fwall = (4 * 240 / 25.0) / frtf
        details["flagship_mfu_pct"] = round(
            fflops / fwall / _peak_flops() * 100.0, 2)
    except Exception as e:  # noqa: BLE001
        details["flagship_rtf"] = f"error: {e}"

    # training throughput
    try:
        details["stage1_train_step_ms"] = round(_train_step_stage1(), 1)
    except Exception as e:  # noqa: BLE001
        details["stage1_train_step_ms"] = f"error: {e}"
    try:
        _train_step_stage1_recipe(details)
    except Exception as e:  # noqa: BLE001
        details["stage1_recipe_step_ms"] = f"error: {e}"
    try:
        details["stage2_train_step_ms"] = round(_train_step_stage2(details), 1)
    except Exception as e:  # noqa: BLE001
        details["stage2_train_step_ms"] = f"error: {e}"

    print(json.dumps({
        "metric": "e2e_video_to_wav_rtf",
        "value": round(rtf, 3),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 5.0, 3),
        "platform": jax.devices()[0].platform,
        "batch": 4,
        "clip_seconds": 9.6,
        "details": details,
    }))


if __name__ == "__main__":
    main()
