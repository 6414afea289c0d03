"""Device-side PCM16 output matches host-side conversion."""

import numpy as np

from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

from test_server import TINY


def test_emit_int16_matches_float_path():
    pipe = Lip2SpeechPipeline.initialize_random(TINY, frames=8)
    pipe16 = Lip2SpeechPipeline(TINY, pipe.stage1_variables, pipe.vocoder_params,
                                emit_int16=True)
    rng = np.random.default_rng(0)
    video = rng.standard_normal((1, 16, 88, 88, 1)).astype(np.float32)
    mask = np.ones((1, 16), bool)
    spk = rng.standard_normal((1, 256)).astype(np.float32)

    f = pipe.synthesise_batch(video, mask, spk)[0]
    i = pipe16.synthesise_batch(video, mask, spk)[0]
    assert i.wav.dtype == np.int16
    host = np.clip(f.wav * 32767.0, -32768, 32767).astype(np.int16)
    # identical up to the last-bit rounding mode
    assert np.abs(i.wav.astype(np.int32) - host.astype(np.int32)).max() <= 1
