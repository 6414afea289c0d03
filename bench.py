"""Benchmark: end-to-end video->waveform real-time factor on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is the north star from BASELINE.json: end-to-end synthesis RTF
(seconds of audio generated per wall-clock second) for the full jitted
video->units+mel->vocoder->wav program. vs_baseline is RTF / 5.0 — the
reference target is >=5x real time per v5e chip (BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax

    from lip2speech_tpu.core.config import preset
    from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

    import jax.numpy as jnp

    cfg = preset("multi_target")
    pipe = Lip2SpeechPipeline.initialize_random(cfg, seed=0, frames=8)
    # serving configuration: bf16 compute (the fp32 ResNet frontend is ~1.8x
    # slower; bf16 units agree with fp32 and waveforms correlate ~1.0) and
    # device-side PCM16 output (the wire format; halves the D2H transfer)
    pipe.compute_dtype = jnp.bfloat16
    pipe.emit_int16 = True

    batch, frames = 4, 240            # 4 clips x 9.6 s = 38.4 s of audio / call
    rng = np.random.default_rng(0)
    video = rng.standard_normal((batch, frames, 88, 88, 1)).astype(np.float32)
    mask = np.ones((batch, frames), bool)
    spk = rng.standard_normal((batch, 256)).astype(np.float32)

    fn = pipe._jitted(None)
    args = (pipe.stage1_variables, pipe.vocoder_params,
            jax.numpy.asarray(video), jax.numpy.asarray(mask), jax.numpy.asarray(spk))

    # warmup / compile
    _ = np.asarray(fn(*args)[0])

    # Each iteration fetches the waveform to host — that device->host transfer
    # is part of the serving path, and it is also the only reliable sync point
    # (block_until_ready returns early under the axon loopback relay).
    n_iters = 10
    start = time.perf_counter()
    for _ in range(n_iters):
        wav = np.asarray(fn(*args)[0])
    wall = (time.perf_counter() - start) / n_iters

    audio_seconds = batch * frames / 25.0
    rtf = audio_seconds / wall
    print(json.dumps({
        "metric": "e2e_video_to_wav_rtf",
        "value": round(rtf, 3),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 5.0, 3),
        "platform": jax.devices()[0].platform,
        "batch": batch,
        "clip_seconds": frames / 25.0,
    }))


if __name__ == "__main__":
    main()
