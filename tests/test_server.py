"""Serving gateway tests: real HTTP against the in-process server with a tiny
random pipeline."""

import base64
import json
import threading
import wave
from http.client import HTTPConnection

import numpy as np
import pytest

from lip2speech_tpu.core.config import (
    ConformerConfig,
    FrontendConfig,
    MultiTargetConfig,
    PipelineConfig,
    VocoderConfig,
)
from lip2speech_tpu.pipeline.db import DB
from lip2speech_tpu.pipeline.server import make_server
from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

TINY = PipelineConfig(
    model=MultiTargetConfig(
        frontend=FrontendConfig(kind="resnet3d"),
        conformer=ConformerConfig(dim=32, ffn_dim=64, heads=2, layers=1, input_dim=512)),
    vocoder=VocoderConfig(
        model_in_dim=80 + 2 * 8, embedding_dim=8, upsample_initial_channel=64,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),)),
)


@pytest.fixture(scope="module")
def server():
    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8),
             "tiny2": Lip2SpeechPipeline.initialize_random(TINY, seed=1, frames=8)}
    srv = make_server(port=0, pipelines=pipes)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


def _req(srv, method, path, body=None):
    conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=300)
    conn.request(method, path, json.dumps(body) if body else None)
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def test_health_and_checkpoints(server):
    code, out = _req(server, "GET", "/health")
    assert code == 200 and out["status"] == "ok"
    code, out = _req(server, "GET", "/checkpoints")
    assert code == 200 and out["checkpoints"] == ["tiny", "tiny2"]


def test_checkpoint_hot_swap(server):
    code, out = _req(server, "POST", "/load_checkpoint", {"name": "tiny2"})
    assert code == 200 and out["active"] == "tiny2"
    code, out = _req(server, "POST", "/load_checkpoint", {"name": "nope"})
    assert code == 400
    _req(server, "POST", "/load_checkpoint", {"name": "tiny"})


def test_synthesise_endpoint(server, tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (30, 96, 96), dtype=np.uint8)
    np.save(tmp_path / "clip.npy", frames)

    code, out = _req(server, "POST", "/synthesise",
                     {"video_path": str(tmp_path / "clip.npy")})
    assert code == 200, out
    assert out["sample_rate"] == 16000
    assert out["num_samples"] == 30 * 640
    wav_bytes = base64.b64decode(out["wav_base64"])
    with wave.open(__import__("io").BytesIO(wav_bytes)) as w:
        assert w.getframerate() == 16000
        assert w.getnframes() == out["num_samples"]

    code, out = _req(server, "GET", "/stats")
    assert out["usage_count"] >= 1


def test_vsg_long_video(server, tmp_path):
    rng = np.random.default_rng(1)
    # 30 s at 25 fps = 750 frames > 24 s limit
    frames = rng.integers(0, 256, (750, 96, 96), dtype=np.uint8)
    np.save(tmp_path / "long.npy", frames)

    code, out = _req(server, "POST", "/synthesise",
                     {"video_path": str(tmp_path / "long.npy")})
    assert code == 400  # over the 24 s cap

    code, out = _req(server, "POST", "/vsg/synthesise",
                     {"video_path": str(tmp_path / "long.npy"),
                      "output_path": str(tmp_path / "out.wav")})
    assert code == 200, out
    assert out["num_samples"] == 750 * 640
    assert (tmp_path / "out.wav").exists()


def test_synthesise_multipart_upload(server, tmp_path):
    """Direct file upload (reference server.py:490-498): multipart `video`
    part (+ optional `audio` part) instead of a server-local path."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (16, 96, 96), dtype=np.uint8)
    np.save(tmp_path / "up.npy", frames)
    boundary = "----l2smp"
    parts = [f"--{boundary}\r\nContent-Disposition: form-data; "
             f"name=\"video\"; filename=\"up.npy\"\r\n"
             f"Content-Type: application/octet-stream\r\n\r\n".encode()
             + (tmp_path / "up.npy").read_bytes() + b"\r\n",
             f"--{boundary}--\r\n".encode()]
    body = b"".join(parts)
    conn = HTTPConnection("127.0.0.1", server.server_address[1], timeout=300)
    conn.request("POST", "/synthesise", body,
                 {"Content-Type": f"multipart/form-data; boundary={boundary}"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    assert resp.status == 200, out
    assert out["num_samples"] == 16 * 640

    # missing the required `video` part is a client error
    conn = HTTPConnection("127.0.0.1", server.server_address[1], timeout=60)
    conn.request("POST", "/synthesise", f"--{boundary}--\r\n".encode(),
                 {"Content-Type": f"multipart/form-data; boundary={boundary}"})
    assert conn.getresponse().status == 400


def test_per_request_checkpoint_cid(server, tmp_path):
    """?cid= selects a loaded checkpoint for one request without hot-swapping
    the active one (reference server.py:494 checkpoint_id)."""
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, (16, 96, 96), dtype=np.uint8)
    np.save(tmp_path / "c.npy", frames)
    body = {"video_path": str(tmp_path / "c.npy")}

    code, out1 = _req(server, "POST", "/synthesise?cid=tiny", body)
    assert code == 200, out1
    code, out2 = _req(server, "POST", "/synthesise?cid=tiny2", body)
    assert code == 200, out2
    # different weights -> different audio; active checkpoint untouched
    assert out1["wav_base64"] != out2["wav_base64"]
    code, out = _req(server, "GET", "/checkpoints")
    assert out["active"] == "tiny"
    code, out = _req(server, "POST", "/synthesise?cid=nope", body)
    assert code == 400 and "unknown checkpoint" in out["error"]


def test_audios_aid_and_flags(server, tmp_path):
    """/audios lists the default-voice library; ?aid= picks one; ?log=0 skips
    usage logging; a present ASR hook adds asr_text unless ?asr=0."""
    state = server.RequestHandlerClass.state
    rng = np.random.default_rng(5)
    state.default_audios["voice1"] = rng.standard_normal(256).astype(np.float32)
    code, out = _req(server, "GET", "/audios")
    assert code == 200 and out["audios"] == ["voice1"]

    frames = rng.integers(0, 256, (16, 96, 96), dtype=np.uint8)
    np.save(tmp_path / "a.npy", frames)
    body = {"video_path": str(tmp_path / "a.npy")}
    code, out = _req(server, "POST", "/synthesise?aid=voice1", body)
    assert code == 200, out
    code, out = _req(server, "POST", "/synthesise?aid=ghost", body)
    assert code == 400 and "unknown audio id" in out["error"]

    class StubASR:
        def run(self, wav, sample_rate=16000):
            return "hello world"

    state.asr = StubASR()
    try:
        code, out = _req(server, "POST", "/synthesise", body)
        assert out["asr_text"] == "hello world"
        _, n0 = _req(server, "GET", "/stats")
        code, out = _req(server, "POST", "/synthesise?asr=0&log=0", body)
        assert "asr_text" not in out
        _, n1 = _req(server, "GET", "/stats")
        assert n1["usage_count"] == n0["usage_count"]   # log=0 skipped the DB
    finally:
        state.asr = None
        state.default_audios.clear()


def test_vocode_endpoint(server, tmp_path):
    """Standalone vocoder service API (reference POST /vocoder, port 5005):
    precomputed units + mel -> wav, without running stage 1."""
    rng = np.random.default_rng(7)
    n_units = 20                                   # 10 video frames
    units = rng.integers(0, 200, n_units).astype(int).tolist()
    mel = rng.standard_normal((2 * n_units, 80)).astype(np.float32)
    np.save(tmp_path / "mel.npy", mel)
    (tmp_path / "u.unt").write_text(" ".join(map(str, units)))

    body = {"units": units, "mel_path": str(tmp_path / "mel.npy")}
    code, out = _req(server, "POST", "/vocode", body)
    assert code == 200, out
    assert out["num_samples"] == n_units * 320
    wav_bytes = base64.b64decode(out["wav_base64"])
    with wave.open(__import__("io").BytesIO(wav_bytes)) as w:
        assert w.getnframes() == out["num_samples"]

    # unt_path form matches the inline form exactly
    code, out2 = _req(server, "POST", "/vocode",
                      {"unt_path": str(tmp_path / "u.unt"),
                       "mel_path": str(tmp_path / "mel.npy")})
    assert code == 200 and out2["wav_base64"] == out["wav_base64"]
    # the second call reuses the first call's jitted program (no recompile
    # per request): the lru_cache around _vocode_jit must have hits
    from lip2speech_tpu.pipeline.server import _vocode_jit
    assert _vocode_jit.cache_info().hits >= 1

    # bad inputs are client errors
    code, out = _req(server, "POST", "/vocode",
                     {"units": units, "mel_path": "/nope.npy"})
    assert code == 400
    code, out = _req(server, "POST", "/vocode",
                     {"units": units[:4], "mel_path": str(tmp_path / "mel.npy")})
    assert code == 400 and "mel" in out["error"]
    # bad speaker path / shape are client errors too, not 500s
    code, out = _req(server, "POST", "/vocode",
                     {"units": units, "mel_path": str(tmp_path / "mel.npy"),
                      "spk_emb_path": "/nope_spk.npy"})
    assert code == 400
    np.save(tmp_path / "spk2d.npy", np.zeros((2, 256), np.float32))
    code, out = _req(server, "POST", "/vocode",
                     {"units": units, "mel_path": str(tmp_path / "mel.npy"),
                      "spk_emb_path": str(tmp_path / "spk2d.npy")})
    assert code == 400 and "spk_emb" in out["error"]
    # nested (non-flat) units are a 400, not a broadcast crash into a 500
    code, out = _req(server, "POST", "/vocode",
                     {"units": [[u] for u in units],
                      "mel_path": str(tmp_path / "mel.npy")})
    assert code == 400 and "flat" in out["error"]
    # more units than the max serving bucket holds -> 400, not a crash
    big = rng.integers(0, 200, 1300).astype(int).tolist()
    np.save(tmp_path / "melbig.npy",
            rng.standard_normal((2600, 80)).astype(np.float32))
    code, out = _req(server, "POST", "/vocode",
                     {"units": big, "mel_path": str(tmp_path / "melbig.npy")})
    assert code == 400 and "bucket" in out["error"]


def test_cdn_static_serving(tmp_path):
    """/cdn/<file> serves from static_dir (reference server.py:471-473) and
    rejects path traversal."""
    static = tmp_path / "static"
    static.mkdir()
    (static / "a.wav").write_bytes(b"RIFFdata")
    (tmp_path / "secret.txt").write_bytes(b"nope")
    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8)}
    srv = make_server(port=0, pipelines=pipes, static_dir=str(static))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=60)
        conn.request("GET", "/cdn/a.wav")
        r = conn.getresponse()
        assert r.status == 200 and r.read() == b"RIFFdata"
        assert r.getheader("Content-Type", "").startswith("audio/")
        # browser URLs: percent-encoded names and cache-busting queries
        (static / "my file.wav").write_bytes(b"RIFFdata2")
        conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=60)
        conn.request("GET", "/cdn/my%20file.wav?t=123")
        r = conn.getresponse()
        assert r.status == 200 and r.read() == b"RIFFdata2"
        for bad in ("/cdn/../secret.txt", "/cdn/%2e%2e/secret.txt",
                    "/cdn/missing.bin"):
            conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=60)
            conn.request("GET", bad)
            assert conn.getresponse().status == 404, bad
        # /video/<id> and /audio/<id> redirect into /cdn (reference
        # server.py:519-525); following the redirect serves the file
        (static / "clip7.wav").write_bytes(b"RIFFaudio")
        conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=60)
        conn.request("GET", "/audio/clip7")
        r = conn.getresponse()
        assert r.status == 302 and r.getheader("Location") == "/cdn/clip7.wav"
        r.read()
        conn.request("GET", "/video/clip7")
        r = conn.getresponse()
        assert r.status == 302 and r.getheader("Location") == "/cdn/clip7.mp4"
        r.read()
        conn.request("GET", "/audio/a/../b")
        assert conn.getresponse().status == 404
        # header-injection / non-latin-1 ids: decoded id is re-quoted, so
        # CRLF cannot split the response and unicode cannot crash it
        conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=60)
        conn.request("GET", "/audio/x%0d%0aSet-Cookie:%20pwned%3D1")
        r = conn.getresponse()
        assert r.status == 302 and r.getheader("Set-Cookie") is None
        assert "%0D%0A" in r.getheader("Location").upper()
        r.read()
        conn.request("GET", "/audio/%E2%98%83")
        r = conn.getresponse()
        assert r.status == 302 and r.getheader("Location") == "/cdn/%E2%98%83.wav"
        r.read()
        # embedded NUL must 404, not crash the handler thread
        conn.request("GET", "/cdn/%00")
        assert conn.getresponse().status == 404
    finally:
        srv.shutdown()


def test_make_server_rejects_fused_tail_with_prebuilt_pipelines():
    """fused_tail only applies when make_server builds the pipeline itself;
    silently ignoring it for a pre-built dict contradicted the caller."""
    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8)}
    with pytest.raises(ValueError, match="fused_tail"):
        make_server(port=0, pipelines=pipes, fused_tail=False)


def test_default_audio_dir_kwarg(tmp_path):
    """make_server(default_audio_dir=...) loads .npy voices at startup."""
    rng = np.random.default_rng(6)
    np.save(tmp_path / "alice.npy", rng.standard_normal(256).astype(np.float32))
    np.save(tmp_path / "bob.npy", rng.standard_normal(256).astype(np.float32))
    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8)}
    srv = make_server(port=0, pipelines=pipes, default_audio_dir=str(tmp_path))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        code, out = _req(srv, "GET", "/audios")
        assert code == 200 and out["audios"] == ["alice", "bob"]
    finally:
        srv.shutdown()


def test_error_handling(server):
    # bad client input is a 400, not a 500 (missing video file)
    code, out = _req(server, "POST", "/synthesise", {"video_path": "/nope.npy"})
    assert code == 400 and "cannot load video" in out["error"]
    code, out = _req(server, "GET", "/nope")
    assert code == 404


def test_serve_real_checkpoints(tmp_path):
    """Server built from SAVED checkpoints (orbax s1_*/g_*): hot-swapping two
    different converted checkpoints changes the synthesized audio."""
    from lip2speech_tpu.train.checkpoint import save_pytree

    pipes_src = {"a": Lip2SpeechPipeline.initialize_random(TINY, seed=0, frames=8),
                 "b": Lip2SpeechPipeline.initialize_random(TINY, seed=9, frames=8)}
    pipelines = {}
    for name, p in pipes_src.items():
        s1_dir = tmp_path / name / "s1_00000001"
        voc_dir = tmp_path / name / "g_00000001"
        save_pytree(s1_dir, {"params": p.stage1_variables["params"],
                             "batch_stats": p.stage1_variables.get("batch_stats", {}),
                             "opt_state": {}, "step": np.zeros((), np.int32)})
        save_pytree(voc_dir, {"generator": p.vocoder_params})
        pipelines[name] = Lip2SpeechPipeline.from_checkpoints(TINY, s1_dir, voc_dir)

    srv = make_server(port=0, pipelines=pipelines)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        rng = np.random.default_rng(2)
        frames = rng.integers(0, 256, (16, 96, 96), dtype=np.uint8)
        np.save(tmp_path / "clip.npy", frames)
        body = {"video_path": str(tmp_path / "clip.npy")}

        code, out_a = _req(srv, "POST", "/synthesise", body)
        assert code == 200, out_a
        code, _ = _req(srv, "POST", "/load_checkpoint", {"name": "b"})
        assert code == 200
        code, out_b = _req(srv, "POST", "/synthesise", body)
        assert code == 200, out_b
        wav_a = base64.b64decode(out_a["wav_base64"])
        wav_b = base64.b64decode(out_b["wav_base64"])
        assert wav_a != wav_b  # different weights -> different audio
    finally:
        srv.shutdown()


def test_db_migrations(tmp_path):
    db = DB(tmp_path / "test.db")
    uid = db.log_usage(3.0, 0.5, audio_name="a.wav", transcription="hello")
    assert uid
    assert db.usage_count() == 1
    db.log_vsg_usage(60.0, "user@example.com")
    db.migrate()  # idempotent
