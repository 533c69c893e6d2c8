#!/usr/bin/env python
"""Time-to-first-audio for serve.py's streaming mode, measured end to end
over HTTP against the flagship model on the attached device.

Builds a flagship-scale fixture (random-init weights — stage timing is
data-independent at static shapes), launches serve.py WITHOUT --warm, and
sends the same 3-sentence streaming request twice:

  cold TTFA: first request on the fresh process — includes jit compiles
             (persistent-cache-covered on a redeploy) and weight upload;
  warm TTFA: second request — steady-state serving latency to first byte.

TTFA is client-side: POST written -> first PCM byte after the 44-byte
streaming WAV header. The server's own log line ("first audio after Ns")
excludes HTTP and is printed alongside.

    python scripts/measure_ttfa.py [--port 8111] [--budget 1800]
"""

import argparse
import http.client
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TEXT = ("The quick brown fox jumps over the lazy dog. "
        "It is well known that deep generative models have a rich latent "
        "space. Speech synthesis on tensor processors is fast.")


def build_fixture(fx):
    os.makedirs(fx, exist_ok=True)
    cfg_path = os.path.join(fx, "config.json")
    ck_path = os.path.join(fx, "radtts_flagship.npz")
    voc_path = os.path.join(fx, "hifigan_v1.pt")
    voc_cfg = os.path.join(fx, "hifigan_v1.json")
    if all(os.path.exists(p) for p in (cfg_path, ck_path, voc_path,
                                       voc_cfg)):
        return cfg_path, ck_path, voc_path, voc_cfg

    import numpy as np
    import torch
    from scipy.io import wavfile

    import jax

    # Pin THIS process to the CPU platform before any backend spins up:
    # `jax.default_device(cpu)` alone still initializes the TPU client,
    # and tunneled TPU transports are single-client — the serve.py child
    # would then block forever on device acquisition (observed as a
    # silent 20-minute hang when the fixture had to be rebuilt). Process-
    # local config, NOT os.environ, so the child doesn't inherit it.
    jax.config.update("jax_platforms", "cpu")

    from bench import HIFIGAN_V1
    from radtts_tpu.models.hifigan import (hifigan_generator_init,
                                           hifigan_generator_to_torch)
    from radtts_tpu.models.radtts import radtts_init
    from radtts_tpu.train.checkpoint import save_checkpoint

    # host-side init only; keep the device free for the server process
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        with open(os.path.join(REPO, "configs",
                               "config_ljs_dap.json")) as f:
            config = json.load(f)
        params = radtts_init(jax.random.PRNGKey(0),
                             config["model_config"])
        save_checkpoint(ck_path, params, iteration=0)
        voc = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    torch.save({"generator": hifigan_generator_to_torch(voc)}, voc_path)
    with open(voc_cfg, "w") as f:
        json.dump(HIFIGAN_V1, f)

    wav_dir = os.path.join(fx, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    sr = 22050
    wavfile.write(os.path.join(wav_dir, "a.wav"), sr,
                  (2000 * np.sin(np.arange(sr) / 30)).astype(np.int16))
    with open(os.path.join(fx, "list.txt"), "w") as f:
        f.write("a.wav|hello there|ljs\n")
    files = {"LJS": {"basedir": fx, "audiodir": "wavs",
                     "filelist": "list.txt", "lmdbpath": ""}}
    config["data_config"]["training_files"] = files
    config["data_config"]["validation_files"] = files
    config["data_config"]["betabinom_cache_path"] = os.path.join(
        fx, "cache")
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    return cfg_path, ck_path, voc_path, voc_cfg


def stream_once(port, budget):
    """POST the streaming request; returns (client_ttfa, total_s, n_bytes).
    client_ttfa = request written -> first byte after the WAV header."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=budget)
    body = json.dumps({"text": TEXT, "stream": True,
                       "long_text_chunk": 64})
    tic = time.perf_counter()
    conn.request("POST", "/tts", body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200, resp.status
    got = b""
    ttfa = None
    while True:
        b = resp.read(4096)
        if ttfa is None and len(got) + len(b) > 44:
            ttfa = time.perf_counter() - tic
        got += b
        if not b:
            break
    total = time.perf_counter() - tic
    conn.close()
    return ttfa, total, len(got)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8111)
    ap.add_argument("--budget", type=float, default=1800.0)
    ap.add_argument("--fixture", default="/tmp/ttfa_fixture")
    args = ap.parse_args()

    cfg, ck, voc, voc_cfg = build_fixture(args.fixture)
    print(f"# fixture ready in {args.fixture}", file=sys.stderr)

    srv = subprocess.Popen(
        [sys.executable, "-u", "serve.py", "-c", cfg, "-r", ck,
         "-v", voc, "-k", voc_cfg, "-s", "ljs",
         "--port", str(args.port), "-d", "0.01"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)

    import threading
    server_lines = []

    def pump():
        for line in srv.stdout:
            server_lines.append(line)
            print(f"[srv] {line}", end="", file=sys.stderr, flush=True)

    threading.Thread(target=pump, daemon=True).start()

    try:
        deadline = time.monotonic() + args.budget
        while time.monotonic() < deadline:
            try:
                c = http.client.HTTPConnection("127.0.0.1", args.port,
                                               timeout=5)
                c.request("GET", "/healthz")
                if c.getresponse().status == 200:
                    break
            except OSError:
                time.sleep(1.0)
        else:
            raise TimeoutError("server never came up")

        print("# server up; COLD streaming request (includes compiles)",
              file=sys.stderr, flush=True)
        cold = stream_once(args.port, args.budget)
        print("# WARM streaming request", file=sys.stderr, flush=True)
        warm = stream_once(args.port, args.budget)
        warm2 = stream_once(args.port, args.budget)

        server_ttfa = [float(ln.rsplit("after ", 1)[1].rstrip("s\n"))
                       for ln in server_lines if "first audio after" in ln]
        print(json.dumps({
            "text_sentences": 3,
            "cold_ttfa_s": round(cold[0], 3),
            "warm_ttfa_s": round(min(warm[0], warm2[0]), 4),
            "warm_total_s": round(min(warm[1], warm2[1]), 4),
            "server_ttfa_s": server_ttfa,
            "stream_bytes": warm[2],
        }))
    finally:
        srv.terminate()
        try:
            srv.wait(10)
        except subprocess.TimeoutExpired:
            srv.kill()


if __name__ == "__main__":
    main()
