"""serve.py daemon drive: boot the warm-model HTTP server on CPU with
reduced-size fixture checkpoints, then exercise /healthz, the single-text
WAV route, and the batched JSON route. The warm-request path means the
second request must not recompile (asserted via latency, loosely)."""

import base64
import io
import json
import os
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest
from scipy.io import wavfile

from tests.test_cli_inference import build_fixtures


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _wav_from_bytes(b):
    sr, audio = wavfile.read(io.BytesIO(b))
    return sr, audio


@pytest.mark.slow
def test_serve_daemon(tmp_path):
    cfg_path, radtts_ckpt, voc_ckpt, voc_cfg, _ = build_fixtures(
        tmp_path, "config_ljs_dap.json")
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # NOT subprocess.PIPE: XLA's stderr chatter (AOT-cache load warnings)
    # can exceed the pipe buffer and block the server mid-init if nobody
    # drains it; a file sidesteps that and keeps the log for failures.
    log_path = tmp_path / "serve.log"
    log = open(log_path, "w")
    proc = subprocess.Popen(
        [sys.executable, "serve.py", "-c", str(cfg_path),
         "-r", str(radtts_ckpt), "-v", str(voc_ckpt), "-k", str(voc_cfg),
         "-s", "ljs", "--port", str(port), "--seed", "7", "--warm",
         "--batch_wait_ms", "400"],
        stdout=log, stderr=subprocess.STDOUT, text=True, env=env)
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 1500
        last = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"server died rc={proc.returncode}:\n"
                    + log_path.read_text()[-4000:])
            try:
                with urllib.request.urlopen(base + "/healthz",
                                            timeout=5) as r:
                    last = json.loads(r.read())
                    break
            except Exception:
                time.sleep(2.0)
        assert last is not None and last["ok"], last

        def post(path, obj, timeout=900):
            req = urllib.request.Request(
                base + path, data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.headers.get("Content-Type"), r.read()

        # single text -> WAV bytes (the warm request compiled a different
        # bucket, so this may compile once more)
        ctype, body = post("/tts", {
            "text": "The quick brown fox jumps over the lazy dog."})
        assert ctype == "audio/wav"
        sr, audio = _wav_from_bytes(body)
        assert sr == 22050
        assert np.isfinite(audio).all()
        assert len(audio) > sr * 0.2 and np.abs(audio).max() > 1e-4

        # same shape bucket again: must be served from the warm program
        tic = time.perf_counter()
        _, body2 = post("/tts", {
            "text": "The quick brown fox jumps over the lazy dog!",
            "sigma": 0.5, "denoising_strength": 0.005})
        warm_s = time.perf_counter() - tic
        assert warm_s < 60, f"warm request took {warm_s:.1f}s (recompiled?)"
        sr2, audio2 = _wav_from_bytes(body2)
        assert np.isfinite(audio2).all() and np.abs(audio2).max() > 1e-4

        # batched route: one dispatch, two wavs, per-item trimming
        ctype, body = post("/tts", {"texts": [
            "Hello world.", "A somewhat longer second sentence here."]})
        assert ctype == "application/json"
        out = json.loads(body)
        assert out["sample_rate"] == 22050 and len(out["wavs"]) == 2
        lens = []
        for b64 in out["wavs"]:
            sr3, audio3 = _wav_from_bytes(base64.b64decode(b64))
            assert np.isfinite(audio3).all() and np.abs(audio3).max() > 1e-4
            lens.append(len(audio3))
        assert lens[0] != lens[1]  # trimmed to each item's duration

        # long-text chunking: split at sentence boundaries server-side,
        # one batched dispatch, chunk wavs joined with a silence gap
        ctype, body = post("/tts", {
            "text": "First sentence here. Second sentence follows!",
            "long_text_chunk": 24, "chunk_gap_ms": 50.0})
        assert ctype == "audio/wav"
        srl, audiol = _wav_from_bytes(body)
        assert np.isfinite(audiol).all() and np.abs(audiol).max() > 1e-4
        # the joined wav carries the 50 ms gap => strictly longer than
        # either chunk alone could be, and contains a silent stretch
        assert len(audiol) > int(srl * 0.05)

        # streaming: chunked-transfer WAV, first chunk dispatched alone;
        # urllib decodes the chunked framing, leaving header + raw PCM
        req = urllib.request.Request(
            base + "/tts", data=json.dumps({
                "text": "First sentence here. Second sentence follows!",
                "long_text_chunk": 24, "chunk_gap_ms": 50.0,
                "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=900) as r:
            assert r.headers.get("Content-Type") == "audio/wav"
            stream_body = r.read()
        assert stream_body[:4] == b"RIFF" and stream_body[8:12] == b"WAVE"
        pcm = np.frombuffer(stream_body[44:], dtype="<f4")
        assert np.isfinite(pcm).all() and np.abs(pcm).max() > 1e-4
        # carries the 50 ms inter-chunk gap of exact silence
        assert len(pcm) > int(22050 * 0.05)
        assert (pcm == 0.0).sum() >= int(22050 * 0.05)

        # error path: bad request gets 400, not a dead server
        req = urllib.request.Request(
            base + "/tts", data=b'{"no_text": 1}',
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["requests"] == 5
        prior_dispatches = health["batched_dispatches"]

        # micro-batching: three concurrent same-key single requests within
        # the 400 ms window must ride FEWER dispatches than requests
        # (normally exactly one B=3 dispatch; allow one straggler)
        import threading
        results = [None] * 3

        def fire(ix):
            try:
                results[ix] = post("/tts", {
                    "text": "The quick brown fox jumps over the lazy dog."})
            except Exception as exc:  # surface in the main thread
                results[ix] = exc

        threads = [threading.Thread(target=fire, args=(ix,))
                   for ix in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=1500)
        for res in results:
            assert not isinstance(res, Exception), res
            ctype_c, body_c = res
            assert ctype_c == "audio/wav"
            src, audc = _wav_from_bytes(body_c)
            assert np.isfinite(audc).all() and np.abs(audc).max() > 1e-4
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["requests"] == 8
        n_disp = health["batched_dispatches"] - prior_dispatches
        assert 1 <= n_disp <= 2, n_disp
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        log.close()
