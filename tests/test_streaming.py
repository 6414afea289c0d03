"""Websocket streaming path test (frames out of order -> end_stream -> wav)."""

import asyncio
import base64
import json

import numpy as np
import pytest

websockets = pytest.importorskip("websockets")

from lip2speech_tpu.pipeline.server import ServerState  # noqa: E402
from lip2speech_tpu.pipeline.streaming import serve_streaming  # noqa: E402
from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline  # noqa: E402

from test_server import TINY  # noqa: E402


def test_streaming_roundtrip():
    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8)}
    state = ServerState(pipes, active="tiny")

    async def scenario():
        server_task = asyncio.create_task(serve_streaming(state, port=5117))
        await asyncio.sleep(0.3)
        try:
            rng = np.random.default_rng(0)
            frames = rng.integers(0, 256, (10, 96, 96), dtype=np.uint8)
            async with websockets.connect("ws://127.0.0.1:5117",
                                          max_size=None, open_timeout=30) as ws:
                # send out of order like a lossy webcam stream
                order = list(range(10))
                rng.shuffle(order)
                for i in order:
                    await ws.send(json.dumps({
                        "type": "frame", "index": i,
                        "height": 96, "width": 96,
                        "data": base64.b64encode(frames[i].tobytes()).decode(),
                    }))
                await ws.send(json.dumps({"type": "end_stream"}))
                resp = json.loads(await asyncio.wait_for(ws.recv(), timeout=600))
            assert resp["type"] == "result"
            assert resp["sample_rate"] == 16000
            assert resp["num_samples"] == 10 * 640
            wav = np.frombuffer(base64.b64decode(resp["wav_base64"]), np.int16)
            assert len(wav) == resp["num_samples"]
        finally:
            server_task.cancel()

    asyncio.run(scenario())


def test_streaming_raw_frames_with_detection():
    """Raw webcam-size frames + detect_landmarks=true: the endpoint crops the
    mouth ROI in-process (reference per-frame dlib path) before synthesis."""
    from test_heuristic_landmarks import _render_face_video

    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8)}
    state = ServerState(pipes, active="tiny")

    async def scenario():
        server_task = asyncio.create_task(serve_streaming(state, port=5118))
        await asyncio.sleep(0.3)
        try:
            frames = _render_face_video(10)          # (10, 240, 320) raw faces
            async with websockets.connect("ws://127.0.0.1:5118",
                                          max_size=None, open_timeout=30) as ws:
                for i in range(10):
                    await ws.send(json.dumps({
                        "type": "frame", "index": i,
                        "height": frames.shape[1], "width": frames.shape[2],
                        "data": base64.b64encode(frames[i].tobytes()).decode(),
                    }))
                await ws.send(json.dumps({"type": "end_stream",
                                          "detect_landmarks": True}))
                resp = json.loads(await asyncio.wait_for(ws.recv(), timeout=600))
            assert resp["type"] == "result", resp
            assert resp["num_samples"] == 10 * 640
        finally:
            server_task.cancel()

    asyncio.run(scenario())


def test_demo_page_advertises_streaming_port():
    from lip2speech_tpu.pipeline.server import DEMO_HTML

    assert "__STREAM_PORT__" in DEMO_HTML       # placeholder present
    assert "getUserMedia" in DEMO_HTML          # webcam capture UI
    assert "end_stream" in DEMO_HTML
