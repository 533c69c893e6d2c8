#!/usr/bin/env python
"""Warm-model TTS serving daemon: load + compile once, synthesize per
HTTP request (capability beyond the reference, whose inference.py reloads
the model per invocation — reference inference.py:80-115).

    python serve.py -c CONFIG -r RADTTS_CKPT -v HIFIGAN_CKPT \
        -k HIFIGAN_CONFIG -s SPEAKER [--port 8008] [--warm]

API (stdlib http.server; no new dependencies):
  GET  /healthz         -> {"ok": true, "model": ..., "requests": N}
  POST /tts   body JSON -> audio/wav bytes (single "text"), or
                           {"sample_rate", "wavs": [b64...], "n_frames"}
                           when given a "texts" list (one device dispatch
                           for the whole batch — the batched path of
                           inference.py --batch_size).
    {"text": "Hello." | "texts": [...], "speaker": "ljs",
     "sigma": 0.8, "sigma_tkndur": 0.666, "sigma_f0": 1.0,
     "sigma_energy": 1.0, "denoising_strength": 0.0, "normalize": true,
     "long_text_chunk": 0, "chunk_gap_ms": 120.0}

A single "text" with "long_text_chunk" > 0 is split at sentence
boundaries into chunks of that many encoded tokens (the CLI's
--long_text_chunk), synthesized as one batched dispatch, and the chunk
waveforms joined with chunk_gap_ms of silence — one WAV out. Adding
"stream": true instead streams the WAV over HTTP chunked transfer: the
first chunk dispatches alone for minimum time-to-first-audio, the rest
ride one batched dispatch (normalization is then per chunk).

Request sigmas/denoising are device scalars in the jitted stages (see
radtts_tpu/synthesizer.py): changing them NEVER recompiles. New (batch,
text-bucket, frame-budget) shapes compile once; on TPU the compiled
executables are additionally serialized into --aot_dir (default
.aot_cache, radtts_tpu/aot_store.py), so a RESTARTED server reloads
them in ~1 s each instead of re-compiling. The model load is template-
based (no random init) and the weight upload is forced to complete
BEFORE /healthz reports ready, so the cold first request pays only
executable deserialization + first dispatch — measured cold first-
request TTFA 51.4 -> 20.6 -> 5.8 s across rounds (scripts/
measure_ttfa.py; --warm absorbs even that at startup).
--warm pre-dispatches one short request at startup so the first real
request doesn't pay the compile.
"""

import argparse
import base64
import io
import json
import threading
import time

import numpy as np


class MicroBatcher:
    """Aggregate concurrent single-text requests into one device dispatch.

    Requests that share a dispatch key (speaker + sigma knobs — these are
    batch-level scalars in the jitted stages) and arrive within
    `wait_ms` of each other ride ONE Synthesizer.synthesize() call of up
    to `max_batch` texts; the padded==exact batching contract
    (tests/test_batched_inference.py) makes grouped results equivalent to
    per-request dispatches. Serving throughput scales accordingly
    (measured 575x realtime at batch 1 vs 910x at batch 8 per chip)."""

    def __init__(self, synth, lock, max_batch=8, wait_ms=5.0):
        self.synth, self.lock = synth, lock
        self.max_batch, self.wait_s = max_batch, wait_ms / 1000.0
        self._cv = threading.Condition()
        self._pending = []  # (key, text, knobs, speaker, box)
        self.dispatches = 0
        threading.Thread(target=self._run, daemon=True).start()

    def synthesize_one(self, key, text, knobs, speaker):
        box = {"ev": threading.Event()}
        with self._cv:
            self._pending.append((key, text, knobs, speaker, box))
            self._cv.notify()
        box["ev"].wait()
        if "err" in box:
            raise box["err"]
        return box["wav"]

    def _run(self):
        while True:
            with self._cv:
                while not self._pending:
                    self._cv.wait()
            time.sleep(self.wait_s)  # let the burst arrive
            with self._cv:
                key0 = self._pending[0][0]
                take, rest = [], []
                for e in self._pending:
                    if e[0] == key0 and len(take) < self.max_batch:
                        take.append(e)
                    else:
                        rest.append(e)
                self._pending = rest
            texts = [e[1] for e in take]
            knobs, speaker = take[0][2], take[0][3]
            try:
                with self.lock:
                    wavs, _ = self.synth.synthesize(texts, speaker,
                                                    **knobs)
                    self.dispatches += 1
                for e, w in zip(take, wavs):
                    e[4]["wav"] = w
            except Exception as exc:
                for e in take:
                    e[4]["err"] = exc
            for e in take:
                e[4]["ev"].set()


def _streaming_wav_header(sr):
    """44-byte IEEE-float mono WAV header with 0xFFFFFFFF sizes — the
    standard convention for streams whose length is unknown up front
    (players read until EOF)."""
    import struct
    return (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32)
            + b"data" + struct.pack("<I", 0xFFFFFFFF))


def make_handler(synth, state, defaults, lock, batcher=None):
    from http.server import BaseHTTPRequestHandler

    from scipy.io.wavfile import write as wav_write

    def render_wav(wav, normalize):
        if normalize:
            peak = float(np.max(np.abs(wav)))
            if peak > 0:
                wav = wav / peak
        buf = io.BytesIO()
        wav_write(buf, synth.sampling_rate, wav.astype(np.float32))
        return buf.getvalue()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through one logger
            print(f"[serve] {fmt % args}", flush=True)

        def _reply(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code, obj):
            self._reply(code, json.dumps(obj).encode())

        def _stream_long(self, text, speaker, max_tokens, gap_ms, knobs,
                         normalize):
            """Stream a long text as WAV over HTTP chunked transfer: the
            first sentence chunk synthesizes alone (smallest possible
            time-to-first-audio), the rest ride one batched dispatch.
            Normalization is per chunk (a global peak needs the whole
            signal). After headers are sent an error can only abort the
            stream — it is logged, not replied."""
            from radtts_tpu.text.chunking import split_text_to_chunks

            parts = ([text] if max_tokens <= 0 else split_text_to_chunks(
                text, lambda s: len(synth.encode(s)), max_tokens))
            sr = synth.sampling_rate
            gap = np.zeros(int(sr * gap_ms / 1000.0), np.float32)

            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def emit(b):
                if b:
                    self.wfile.write(f"{len(b):X}\r\n".encode() + b
                                     + b"\r\n")

            def pcm(w):
                if normalize:
                    peak = float(np.max(np.abs(w)))
                    if peak > 0:
                        w = w / peak
                return np.asarray(w, np.float32).astype("<f4").tobytes()

            try:
                emit(_streaming_wav_header(sr))
                tic = time.perf_counter()
                with lock:
                    first, _ = synth.synthesize(parts[0], speaker, **knobs)
                    state["requests"] += 1
                emit(pcm(first[0]))
                ttfa = time.perf_counter() - tic
                if len(parts) > 1:
                    emit(gap.tobytes())
                    with lock:
                        rest, _ = synth.synthesize(parts[1:], speaker,
                                                   **knobs)
                    for j, w in enumerate(rest):
                        emit(pcm(w))
                        if j < len(rest) - 1:
                            emit(gap.tobytes())
                self.wfile.write(b"0\r\n\r\n")
                print(f"[serve] streamed {len(parts)} chunk(s), "
                      f"first audio after {ttfa:.3f}s", flush=True)
            except Exception as exc:
                print(f"[serve] stream aborted: {exc!r}", flush=True)
                try:
                    self.wfile.write(b"0\r\n\r\n")
                except Exception:
                    pass

        def do_GET(self):
            if self.path in ("/healthz", "/"):
                extra = ({"batched_dispatches": batcher.dispatches}
                         if batcher is not None else {})
                self._reply_json(200, {"ok": True, **state, **extra})
            else:
                self._reply_json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/tts":
                self._reply_json(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                texts = req.get("texts")
                single = texts is None
                if single:
                    texts = [req["text"]]
                knobs = {k: float(req.get(k, defaults[k]))
                         for k in ("sigma", "sigma_tkndur", "sigma_f0",
                                   "sigma_energy", "denoising_strength")}
                speaker = req.get("speaker", defaults["speaker"])
                normalize = bool(req.get("normalize", True))
                chunk_tokens = int(req.get("long_text_chunk",
                                           defaults["long_text_chunk"]))
                gap_ms = float(req.get("chunk_gap_ms",
                                       defaults["chunk_gap_ms"]))
            except Exception as exc:
                self._reply_json(400, {"error": repr(exc)})
                return
            if bool(req.get("stream", False)) and single:
                # time-to-first-audio mode: chunk 1 dispatches ALONE and
                # starts streaming while the remaining chunks run as one
                # batch; WAV bytes go out via HTTP chunked transfer
                self._stream_long(texts[0], speaker, chunk_tokens, gap_ms,
                                  knobs, normalize)
                return
            try:
                tic = time.perf_counter()
                aux = None
                if (batcher is not None and single and chunk_tokens <= 0):
                    # concurrent same-key singles share one device dispatch
                    key = (speaker, tuple(sorted(knobs.items())))
                    wavs = [batcher.synthesize_one(key, texts[0], knobs,
                                                   speaker)]
                    with lock:
                        state["requests"] += 1
                else:
                    with lock:  # one device pipeline; batch in-request
                        if single and chunk_tokens > 0:
                            wav, aux = synth.synthesize_long(
                                texts[0], speaker, max_tokens=chunk_tokens,
                                gap_ms=gap_ms, **knobs)
                            wavs = [wav]
                        else:
                            wavs, aux = synth.synthesize(texts, speaker,
                                                         **knobs)
                        # inside the lock: ThreadingHTTPServer handlers
                        # run concurrently; += on shared state isn't atomic
                        state["requests"] += 1
                dt = time.perf_counter() - tic
                audio_s = sum(len(w) for w in wavs) / synth.sampling_rate
                print(f"[serve] {len(texts)} text(s) -> {audio_s:.2f}s "
                      f"audio in {dt:.3f}s (RTF {dt / max(audio_s, 1e-9):.4f})",
                      flush=True)
            except Exception as exc:
                self._reply_json(500, {"error": repr(exc)})
                return
            if single:
                self._reply(200, render_wav(wavs[0], normalize),
                            ctype="audio/wav")
            else:
                self._reply_json(200, {
                    "sample_rate": synth.sampling_rate,
                    "n_frames": aux["n_frames"].tolist(),
                    "wavs": [base64.b64encode(
                        render_wav(w, normalize)).decode() for w in wavs]})

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('-c', '--config', type=str, required=True)
    ap.add_argument('-p', '--params', nargs='+', default=[])
    ap.add_argument('-r', '--radtts_path', type=str, required=True)
    ap.add_argument('-v', '--vocoder_path', type=str, required=True)
    ap.add_argument('-k', '--config_vocoder', type=str, required=True)
    ap.add_argument('-s', '--speaker', type=str, required=True,
                    help="default speaker (requests may override)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", default=8008, type=int)
    ap.add_argument("--sigma", default=0.8, type=float)
    ap.add_argument("--sigma_tkndur", default=0.666, type=float)
    ap.add_argument("--sigma_f0", default=1.0, type=float)
    ap.add_argument("--sigma_energy", default=1.0, type=float)
    ap.add_argument("-d", "--denoising_strength", default=0.0, type=float)
    ap.add_argument("--token_dur_scaling", default=1.0, type=float)
    ap.add_argument("--f0_mean", default=0.0, type=float)
    ap.add_argument("--f0_std", default=0.0, type=float)
    ap.add_argument("--energy_mean", default=0.0, type=float)
    ap.add_argument("--energy_std", default=0.0, type=float)
    ap.add_argument("--long_text_chunk", default=0, type=int,
                    help="default sentence-chunking token budget for "
                         "single-text requests (0 = off)")
    ap.add_argument("--chunk_gap_ms", default=120.0, type=float)
    ap.add_argument("--data_parallel", default=1, type=int,
                    help="shard request batches over this many devices "
                         "(weights replicated)")
    ap.add_argument("--batch_wait_ms", default=0.0, type=float,
                    help="micro-batching window: concurrent single-text "
                         "requests sharing speaker+knobs within this many "
                         "ms ride one device dispatch (0 = off)")
    ap.add_argument("--max_batch", default=8, type=int,
                    help="micro-batching cap per dispatch")
    ap.add_argument("--weight_dtype", default="auto",
                    choices=["auto", "float32", "bfloat16"],
                    help="inference weight storage after norm folding: "
                         "'auto' = float32; bfloat16 is bit-equal on TPU "
                         "at default matmul precision and halves resident "
                         "conv-weight bytes, but measured not faster "
                         "(scripts/ab_fold_bf16.py)")
    ap.add_argument("--aot_dir", default=".aot_cache",
                    help="directory of serialized compiled executables "
                         "(radtts_tpu/aot_store.py): a fresh daemon "
                         "process reloads its stage programs in ~1 s "
                         "instead of recompiling through the tunnel; "
                         "'' disables. TPU backends only")
    ap.add_argument("--use_amp", action="store_true")
    ap.add_argument("--matmul_precision", default=None,
                    choices=["default", "high", "highest"])
    ap.add_argument("--seed", default=1234, type=int)
    ap.add_argument("--warm", action="store_true",
                    help="compile-warm the pipeline with one short "
                         "request before accepting traffic")
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    from radtts_tpu.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from radtts_tpu.config import update_params
    from radtts_tpu.synthesizer import Synthesizer

    with open(args.config) as f:
        config = json.load(f)
    update_params(config, args.params)

    synth = Synthesizer(
        config, args.radtts_path, args.vocoder_path, args.config_vocoder,
        use_amp=args.use_amp, seed=args.seed,
        token_dur_scaling=args.token_dur_scaling, f0_mean=args.f0_mean,
        f0_std=args.f0_std, energy_mean=args.energy_mean,
        energy_std=args.energy_std,
        # single texts pad to the batch path's 16-token buckets (padded ==
        # exact) so a long-running server compiles a BOUNDED set of
        # text-length programs, not one per distinct request length
        bucket_single=True, data_parallel=args.data_parallel,
        weight_dtype=args.weight_dtype, aot_dir=args.aot_dir)
    print(f"[serve] loaded '{args.radtts_path}' "
          f"(weights {synth.weight_dtype})", flush=True)

    defaults = {"sigma": args.sigma, "sigma_tkndur": args.sigma_tkndur,
                "sigma_f0": args.sigma_f0, "sigma_energy": args.sigma_energy,
                "denoising_strength": args.denoising_strength,
                "speaker": args.speaker,
                "long_text_chunk": args.long_text_chunk,
                "chunk_gap_ms": args.chunk_gap_ms}
    state = {"model": args.radtts_path, "requests": 0,
             "warm": not args.warm}
    lock = threading.Lock()
    batcher = (MicroBatcher(synth, lock, max_batch=args.max_batch,
                            wait_ms=args.batch_wait_ms)
               if args.batch_wait_ms > 0 else None)

    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(synth, state, defaults, lock, batcher=batcher))

    if args.warm:
        # listen first, compile behind the request lock: healthz answers
        # immediately ("warm": false) and the first real request simply
        # queues behind the warm compile instead of connection-refusing
        def warm():
            tic = time.perf_counter()
            with lock:
                synth.synthesize(
                    "Warm up.", args.speaker, sigma=args.sigma,
                    sigma_tkndur=args.sigma_tkndur, sigma_f0=args.sigma_f0,
                    sigma_energy=args.sigma_energy,
                    denoising_strength=args.denoising_strength)
            state["warm"] = True
            print(f"[serve] warm synthesis in "
                  f"{time.perf_counter() - tic:.1f}s", flush=True)

        threading.Thread(target=warm, daemon=True).start()

    print(f"[serve] listening on http://{args.host}:{args.port}",
          flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
