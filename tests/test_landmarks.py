"""Landmark provider + server landmark/speaker path tests."""

import numpy as np
import pytest

from lip2speech_tpu.pipeline import landmarks as lmk
from lip2speech_tpu.pipeline.mouth_crop import default_mean_face


def test_precomputed_provider_roundtrip(tmp_path):
    t = 8
    mean_face = default_mean_face()
    lms = np.stack([mean_face * 0.8 + [40, 20] for _ in range(t)])
    np.save(tmp_path / "lm.npy", lms)
    provider = lmk.PrecomputedLandmarks(tmp_path / "lm.npy")
    frames = np.zeros((t, 240, 320), np.uint8)
    out = provider(frames)
    assert len(out) == t
    np.testing.assert_allclose(out[0], lms[0])

    cropped = lmk.extract_mouth_video(frames, provider)
    assert cropped.shape == (t, 96, 96)


def test_precomputed_length_mismatch(tmp_path):
    np.save(tmp_path / "lm.npy", np.zeros((3, 68, 2)))
    provider = lmk.PrecomputedLandmarks(tmp_path / "lm.npy")
    with pytest.raises(ValueError, match="landmark rows"):
        provider(np.zeros((5, 10, 10), np.uint8))


def test_server_speaker_wav_and_landmark_path(tmp_path):
    import json
    import threading
    from http.client import HTTPConnection

    import jax

    from lip2speech_tpu.models.speaker import init_params
    from lip2speech_tpu.pipeline.server import Handler, ServerState
    from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline
    from lip2speech_tpu.utils.audio_io import write_wav
    from http.server import ThreadingHTTPServer

    from test_server import TINY

    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8)}
    state = ServerState(pipes, active="tiny",
                        speaker_params=init_params(jax.random.PRNGKey(0)))
    handler = type("H", (Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(0)
        # raw full-face video + landmarks
        mean_face = default_mean_face()
        t = 10
        frames = rng.integers(0, 256, (t, 240, 320), dtype=np.uint8)
        lms = np.stack([mean_face * 0.8 + [40, 20] for _ in range(t)])
        np.save(tmp_path / "raw.npy", frames)
        np.save(tmp_path / "lm.npy", lms)
        wav = 0.3 * np.sin(np.arange(16000) / 16000 * 2 * np.pi * 220)
        write_wav(tmp_path / "spk.wav", wav, 16000)

        conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=600)
        conn.request("POST", "/synthesise", json.dumps({
            "video_path": str(tmp_path / "raw.npy"),
            "landmarks_path": str(tmp_path / "lm.npy"),
            "spk_wav_path": str(tmp_path / "spk.wav"),
            "output_path": str(tmp_path / "out.wav"),
        }))
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert resp.status == 200, out
        assert out["num_samples"] == t * 640
    finally:
        srv.shutdown()
