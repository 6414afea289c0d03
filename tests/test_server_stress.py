"""Serving hardening under concurrency (VERDICT r2 next #7).

Stress the batched gateway with many threads across MIXED bucket lengths:
- no deadlock (bounded joins)
- correct per-request id->wav mapping (each response bit-equals that clip's
  single-request synthesis)
- fewer device calls than requests (requests actually coalesce)
and the websocket path with interleaved concurrent streams.
"""

import base64
import json
import threading
import wave
import io as _io
from http.client import HTTPConnection
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from lip2speech_tpu.pipeline.server import Handler, ServerState
from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

from tests.test_server import TINY

N_REQ = 12
LENGTHS = [10, 20, 30, 44, 60, 90, 100, 120, 12, 47, 96, 31]  # buckets 48/96/160


def _wav_samples(b64):
    with wave.open(_io.BytesIO(base64.b64decode(b64))) as w:
        return np.frombuffer(w.readframes(w.getnframes()), np.int16)


def test_stress_mixed_buckets(tmp_path):
    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8)}
    state = ServerState(pipes, active="tiny", use_batcher=True,
                        max_batch=8, max_wait_ms=150.0)

    calls = []   # (padded device batch, real requests inside)
    orig = pipes["tiny"].synthesise_batch

    def spy(video, mask, spk):
        calls.append((video.shape[0], int(np.asarray(mask).any(axis=1).sum())))
        return orig(video, mask, spk)

    pipes["tiny"].synthesise_batch = spy

    handler = type("H", (Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(0)
        clips = []
        for i, n in enumerate(LENGTHS):
            frames = rng.integers(0, 256, (n, 96, 96), dtype=np.uint8)
            p = tmp_path / f"clip{i}.npy"
            np.save(p, frames)
            clips.append(p)

        results = [None] * N_REQ

        def post(i):
            conn = HTTPConnection("127.0.0.1", srv.server_address[1],
                                  timeout=600)
            conn.request("POST", "/synthesise",
                         json.dumps({"video_path": str(clips[i])}))
            resp = conn.getresponse()
            results[i] = (resp.status, json.loads(resp.read()))

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(N_REQ)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
            assert not t.is_alive(), "request thread deadlocked"

        device_calls_concurrent = len(calls)
        for i, (status, out) in enumerate(results):
            assert status == 200, out
            assert out["num_samples"] == LENGTHS[i] * 640, (i, out)

        # correctness of the id->wav mapping: batched output must equal the
        # same clip synthesized alone
        for i in (0, 3, 6, 11):
            conn = HTTPConnection("127.0.0.1", srv.server_address[1],
                                  timeout=600)
            conn.request("POST", "/synthesise",
                         json.dumps({"video_path": str(clips[i])}))
            solo = json.loads(conn.getresponse().read())
            np.testing.assert_array_equal(
                _wav_samples(results[i][1]["wav_base64"]),
                _wav_samples(solo["wav_base64"]))

        # coalescing happened: fewer device calls than concurrent requests
        assert device_calls_concurrent < N_REQ, calls
        concurrent = calls[:device_calls_concurrent]
        assert sum(real for _, real in concurrent) == N_REQ
        # device batches come padded to powers of two (bounded compile set)
        for padded, real in concurrent:
            assert padded == 1 << (real - 1).bit_length(), calls
    finally:
        srv.shutdown()
        for b in state.batchers.values():
            b.close()


def test_streaming_interleaved_sessions():
    """Two websocket clients streaming frames interleaved: each must get its
    OWN clip's synthesis back (per-connection stream state, no crosstalk)."""
    websockets = pytest.importorskip("websockets")
    import asyncio

    from lip2speech_tpu.pipeline.streaming import serve_streaming

    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8)}
    state = ServerState(pipes, active="tiny")

    rng = np.random.default_rng(1)
    # DIFFERENT lengths: any cross-stream frame leakage corrupts the counts
    # (a random-weight tiny model maps different videos to near-identical
    # audio, so content equality is not a usable isolation probe)
    n_a, n_b = 8, 11
    clip_a = rng.integers(0, 256, (n_a, 96, 96), dtype=np.uint8)
    clip_b = rng.integers(0, 256, (n_b, 96, 96), dtype=np.uint8)

    async def run_client(clip, ws, finish):
        for i in range(len(clip)):
            await ws.send(json.dumps({
                "type": "frame", "index": i, "height": 96, "width": 96,
                "data": base64.b64encode(clip[i].tobytes()).decode()}))
            await asyncio.sleep(0.01)   # force interleaving with the peer
        if finish:
            await ws.send(json.dumps({"type": "end_stream"}))
            reply = json.loads(await ws.recv())
            return reply
        return None

    async def scenario():
        task = asyncio.create_task(serve_streaming(state, port=5119))
        await asyncio.sleep(0.3)
        try:
            async with websockets.connect("ws://127.0.0.1:5119",
                                          max_size=None, open_timeout=30) as wa, \
                    websockets.connect("ws://127.0.0.1:5119",
                                       max_size=None, open_timeout=30) as wb:
                ra, rb = await asyncio.gather(run_client(clip_a, wa, True),
                                              run_client(clip_b, wb, True))
            return ra, rb
        finally:
            task.cancel()

    ra, rb = asyncio.run(asyncio.wait_for(scenario(), timeout=600))
    # per-stream frame counts survived the interleaving: no leakage
    assert ra["num_samples"] == n_a * 640
    assert rb["num_samples"] == n_b * 640
    wav_a = np.frombuffer(base64.b64decode(ra["wav_base64"]), np.int16)

    # each matches its own solo synthesis
    async def solo(clip):
        async with websockets.connect("ws://127.0.0.1:5121", max_size=None,
                                      open_timeout=30) as ws:
            return await run_client(clip, ws, True)

    async def scenario2():
        task = asyncio.create_task(serve_streaming(state, port=5121))
        await asyncio.sleep(0.3)
        try:
            return await solo(clip_a)
        finally:
            task.cancel()

    sa = asyncio.run(asyncio.wait_for(scenario2(), timeout=600))
    np.testing.assert_array_equal(
        wav_a, np.frombuffer(base64.b64decode(sa["wav_base64"]), np.int16))


def test_stress_vocode_and_synthesise_share_device_lock(tmp_path):
    """Concurrent /vocode + /synthesise: both paths serialize on the state's
    device lock — no deadlock, every response correct for ITS request."""
    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8)}
    state = ServerState(pipes, active="tiny")
    handler = type("H", (Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(2)
        n_frames, units_lens = 10, [8, 20, 14, 30]
        frames = rng.integers(0, 256, (n_frames, 96, 96), dtype=np.uint8)
        np.save(tmp_path / "clip.npy", frames)
        jobs = []
        for i, n in enumerate(units_lens):
            units = rng.integers(0, 200, n).tolist()
            np.save(tmp_path / f"mel{i}.npy",
                    rng.standard_normal((2 * n, 80)).astype(np.float32))
            jobs.append(("/vocode", {"units": units,
                                     "mel_path": str(tmp_path / f"mel{i}.npy")},
                         n * 320))
        jobs += [("/synthesise", {"video_path": str(tmp_path / "clip.npy")},
                  n_frames * 640)] * 2

        results = [None] * len(jobs)

        def post(i):
            path, body, _ = jobs[i]
            conn = HTTPConnection("127.0.0.1", srv.server_address[1],
                                  timeout=600)
            conn.request("POST", path, json.dumps(body))
            resp = conn.getresponse()
            results[i] = (resp.status, json.loads(resp.read()))

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(jobs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
            assert not t.is_alive(), "request thread deadlocked"
        for i, (status, out) in enumerate(results):
            assert status == 200, (i, out)
            assert out["num_samples"] == jobs[i][2], (i, out)
    finally:
        srv.shutdown()
