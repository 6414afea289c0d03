"""Dynamic batcher tests: concurrent requests coalesce into batched calls."""

import threading

import numpy as np
import pytest

from lip2speech_tpu.pipeline.batcher import DynamicBatcher
from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

from test_server import TINY


@pytest.fixture(scope="module")
def batcher():
    pipe = Lip2SpeechPipeline.initialize_random(TINY, frames=8)
    b = DynamicBatcher(pipe, max_batch=4, max_wait_ms=50.0)
    yield b
    b.close()


def test_single_request(batcher):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (20, 96, 96), dtype=np.uint8)
    res = batcher.synthesise(frames, np.zeros(256, np.float32))
    assert res.wav.shape == (20 * 640,)


def test_concurrent_requests_batched(batcher):
    rng = np.random.default_rng(1)
    calls = []
    orig = batcher.pipeline.synthesise_batch

    def spy(video, mask, spk):
        calls.append(video.shape[0])
        return orig(video, mask, spk)

    batcher.pipeline.synthesise_batch = spy
    try:
        results = [None] * 4
        def work(i):
            frames = rng.integers(0, 256, (16 + i, 96, 96), dtype=np.uint8)
            results[i] = batcher.synthesise(frames, np.zeros(256, np.float32))
        threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r is not None for r in results)
        for i, r in enumerate(results):
            assert r.wav.shape == ((16 + i) * 640,)
        # at least one device call carried more than one request
        assert max(calls) >= 2, calls
    finally:
        batcher.pipeline.synthesise_batch = orig


def test_error_propagates(batcher):
    with pytest.raises(Exception):
        batcher.synthesise(np.zeros((0, 96, 96), np.uint8),
                           np.zeros(256, np.float32), timeout=30)
