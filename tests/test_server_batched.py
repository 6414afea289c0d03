"""Gateway with dynamic batching: concurrent HTTP requests coalesce."""

import json
import threading
from http.client import HTTPConnection
from http.server import ThreadingHTTPServer

import numpy as np

from lip2speech_tpu.pipeline.server import Handler, ServerState
from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

from test_server import TINY


def test_batched_gateway_concurrent_requests(tmp_path):
    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8)}
    state = ServerState(pipes, active="tiny", use_batcher=True,
                        max_batch=4, max_wait_ms=100.0)

    calls = []
    orig = pipes["tiny"].synthesise_batch

    def spy(video, mask, spk):
        calls.append(video.shape[0])
        return orig(video, mask, spk)

    pipes["tiny"].synthesise_batch = spy

    handler = type("H", (Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(0)
        paths = []
        for i in range(4):
            frames = rng.integers(0, 256, (24, 96, 96), dtype=np.uint8)
            p = tmp_path / f"clip{i}.npy"
            np.save(p, frames)
            paths.append(p)

        results = [None] * 4

        def post(i):
            conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=600)
            conn.request("POST", "/synthesise",
                         json.dumps({"video_path": str(paths[i]),
                                     "output_path": str(tmp_path / f"out{i}.wav")}))
            resp = conn.getresponse()
            results[i] = (resp.status, json.loads(resp.read()))

        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for status, out in results:
            assert status == 200, out
            assert out["num_samples"] == 24 * 640
        assert max(calls) >= 2, calls  # coalesced into a batched device call
    finally:
        srv.shutdown()
        for b in state.batchers.values():
            b.close()
