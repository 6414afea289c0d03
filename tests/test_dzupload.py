"""Chunked-upload endpoint (/dzupload, reference server.py:533-551) tests:
multi-chunk multipart assembly feeding /vsg/synthesise, out-of-order chunks,
size-mismatch 500, and the 413 oversize caps the reference lacks."""

import json
import threading
from http.client import HTTPConnection

import numpy as np
import pytest

from lip2speech_tpu.pipeline import server as server_mod
from lip2speech_tpu.pipeline.server import make_server
from lip2speech_tpu.pipeline.synthesise import Lip2SpeechPipeline

from tests.test_server import TINY


@pytest.fixture(scope="module")
def server():
    pipes = {"tiny": Lip2SpeechPipeline.initialize_random(TINY, frames=8)}
    srv = make_server(port=0, pipelines=pipes)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


def _post_chunk(srv, upload_id, filename, payload, *, offset, index, total,
                total_size):
    """POST one Dropzone-style multipart chunk."""
    boundary = "----l2sboundary"
    parts = []
    for name, val in [("dzchunkbyteoffset", offset), ("dzchunkindex", index),
                      ("dztotalchunkcount", total),
                      ("dztotalfilesize", total_size)]:
        parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                     f"name=\"{name}\"\r\n\r\n{val}\r\n".encode())
    parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                 f"name=\"file\"; filename=\"{filename}\"\r\n"
                 f"Content-Type: application/octet-stream\r\n\r\n".encode()
                 + payload + b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)
    conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=60)
    conn.request("POST", f"/dzupload?id={upload_id}", body,
                 {"Content-Type": f"multipart/form-data; boundary={boundary}"})
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def _req(srv, method, path, body=None, headers=None):
    conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=300)
    conn.request(method, path, json.dumps(body) if body else None, headers or {})
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def test_multichunk_upload_feeds_vsg(server, tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (20, 96, 96), dtype=np.uint8)
    clip = tmp_path / "clip.npy"
    np.save(clip, frames)
    blob = clip.read_bytes()

    # upload in 3 chunks, deliberately out of order (2, 0, 1): correct
    # assembly requires honoring dzchunkbyteoffset (r+b, not append mode)
    third = len(blob) // 3
    chunks = [(0, blob[:third]), (1, blob[third:2 * third]),
              (2, blob[2 * third:])]
    order = [chunks[2], chunks[0], chunks[1]]
    for index, payload in order:
        offset = sum(len(c[1]) for c in chunks[:index])
        code, out = _post_chunk(server, "upl1", "clip.npy", payload,
                                offset=offset, index=index, total=3,
                                total_size=len(blob))
        assert code == 200, out

    code, out = _req(server, "POST", "/vsg/synthesise", {"upload_id": "upl1"})
    assert code == 200, out
    assert out["num_samples"] == 20 * 640


def test_size_mismatch_is_500(server):
    # final chunk claims a wrong dztotalfilesize -> reference returns 500
    code, out = _post_chunk(server, "upl2", "x.bin", b"abcdef",
                            offset=0, index=0, total=1, total_size=999)
    assert code == 500 and "mismatch" in out["error"]


def test_oversize_chunk_413(server):
    code, out = _post_chunk(server, "upl3", "x.bin", b"a",
                            offset=0, index=0, total=1,
                            total_size=server_mod.MAX_UPLOAD_BYTES + 1)
    assert code == 413

    # oversize Content-Length rejected before reading the body
    conn = HTTPConnection("127.0.0.1", server.server_address[1], timeout=60)
    conn.putrequest("POST", "/dzupload?id=upl4")
    conn.putheader("Content-Type", "application/octet-stream")
    conn.putheader("Content-Length", str(server_mod.MAX_CHUNK_BYTES + 1))
    conn.endheaders()
    # do not actually send the body; server answers from the header alone
    resp = conn.getresponse()
    assert resp.status == 413


def test_bad_upload_ids(server):
    code, _ = _post_chunk(server, "..%2Fevil", "x.bin", b"a",
                          offset=0, index=0, total=1, total_size=1)
    assert code == 400
    conn = HTTPConnection("127.0.0.1", server.server_address[1], timeout=60)
    conn.request("POST", "/dzupload", b"xx",
                 {"Content-Type": "application/octet-stream"})
    assert conn.getresponse().status == 400  # no id at all

    code, out = _req(server, "POST", "/vsg/synthesise",
                     {"upload_id": "never-uploaded"})
    assert code == 400  # unknown upload id is client error


def test_binary_payload_with_crlf_tail_is_exact(server, tmp_path):
    """Multipart parsing must keep payload bytes verbatim: a chunk whose last
    bytes are 0x0D/0x0A must not be truncated (a blanket strip(b"\\r\\n")
    would eat them and the final size check would reject the upload)."""
    payload = b"x" * 100 + b"\r\n\n\r"          # hostile tail
    code, out = _post_chunk(server, "crlf-tail", "t.bin", payload,
                            offset=0, index=0, total=1,
                            total_size=len(payload))
    assert code == 200, out
    path = server.RequestHandlerClass.state.inputs_dir / "crlf-tail_t.bin"
    assert path.read_bytes() == payload


def test_upload_id_cannot_glob_or_collide(server, tmp_path):
    """upload ids are a strict charset: no glob metacharacters (an id of '*'
    must not resolve another request's staged file) and no underscore (the
    on-disk id/filename separator, so prefix matches cannot collide)."""
    code, _ = _post_chunk(server, "victim-1", "v.bin", b"secret",
                          offset=0, index=0, total=1, total_size=6)
    assert code == 200
    for bad in ("*", "victim-1_x", "a.b", "[a-z]", "x%20y"):
        code, _ = _post_chunk(server, bad, "x.bin", b"a",
                              offset=0, index=0, total=1, total_size=1)
        assert code == 400, bad
        code, out = _req(server, "POST", "/vsg/synthesise",
                         {"upload_id": bad})
        assert code == 400, bad


def test_missing_chunk_hole_is_rejected(server):
    """seek-past-EOF creates a sparse file of the full declared size, so
    completion requires EVERY chunk index, and an incomplete upload must not
    be synthesisable (the sparse file would be zero-hole-filled garbage)."""
    # send only the LAST of 3 chunks: st_size == total_size but chunks 0,1
    # never arrived -> still in progress, not complete
    code, out = _post_chunk(server, "holey", "h.bin", b"cc",
                            offset=4, index=2, total=3, total_size=6)
    assert code == 200 and out["complete"] is False
    code, out = _req(server, "POST", "/vsg/synthesise", {"upload_id": "holey"})
    assert code == 400 and "incomplete" in out["error"]


def test_vsg_page_and_email_notify(server, tmp_path, monkeypatch):
    """GET /vsg serves the chunked-upload page (reference templates/vsg.html);
    /vsg/synthesise with an email field attempts the completion notification
    (reference vsg_service.py:126-135) without failing the request."""
    conn = HTTPConnection("127.0.0.1", server.server_address[1], timeout=60)
    conn.request("GET", "/vsg")
    resp = conn.getresponse()
    page = resp.read().decode()
    assert resp.status == 200
    assert "/dzupload" in page and "/vsg/synthesise" in page
    assert "dzchunkbyteoffset" in page  # chunking fields wired

    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (8, 96, 96), dtype=np.uint8)
    clip = tmp_path / "c3.npy"
    np.save(clip, frames)
    blob = clip.read_bytes()
    conn = HTTPConnection("127.0.0.1", server.server_address[1], timeout=60)
    conn.request("POST",
                 f"/dzupload?id=upl6&filename=c3.npy&dztotalfilesize={len(blob)}",
                 blob, {"Content-Type": "application/octet-stream"})
    assert conn.getresponse().status == 200

    sent = {}

    def fake_send(subject, body, receivers=None, **kw):
        sent["receivers"] = receivers
        return True

    from lip2speech_tpu.utils import email_client

    monkeypatch.setattr(email_client, "send_email", fake_send)
    code, out = _req(server, "POST", "/vsg/synthesise",
                     {"upload_id": "upl6", "email": "user@example.com"})
    assert code == 200, out
    assert out["email_sent"] is True
    assert sent["receivers"] == ["user@example.com"]

    # without SMTP creds the real sender declines without failing the request
    monkeypatch.undo()
    code, out = _req(server, "POST", "/vsg/synthesise",
                     {"upload_id": "upl6", "email": "user@example.com"})
    assert code == 200 and out["email_sent"] is False


def test_raw_binary_convenience_mode(server, tmp_path):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (8, 96, 96), dtype=np.uint8)
    clip = tmp_path / "c2.npy"
    np.save(clip, frames)
    blob = clip.read_bytes()
    conn = HTTPConnection("127.0.0.1", server.server_address[1], timeout=60)
    conn.request("POST",
                 f"/dzupload?id=upl5&filename=c2.npy&dztotalfilesize={len(blob)}",
                 blob, {"Content-Type": "application/octet-stream"})
    resp = conn.getresponse()
    assert resp.status == 200, resp.read()
    code, out = _req(server, "POST", "/vsg/synthesise", {"upload_id": "upl5"})
    assert code == 200, out
