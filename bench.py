#!/usr/bin/env python
"""Benchmark: LJSpeech-style text -> waveform real-time factor on one chip.

Runs the flagship RADTTS++ (config_ljs_dap model config) + HiFi-GAN v1
pipeline end-to-end (durations -> attributes -> inverse flow -> vocoder ->
denoiser), jitted, steady-state timed (compile excluded).

Prints ONE JSON line:
  {"metric": "text_to_wav_rtf", "value": RTF, "unit": "compute_s_per_audio_s",
   "vs_baseline": target_rtf / measured_rtf}
The baseline target is RTF 0.01/chip (BASELINE.md north star; the reference
publishes no numbers).

Budget discipline (the round-2 bench timed out with nothing printed):
- ONE compiled program total. The measurement scan takes the trip count as a
  runtime operand: inactive steps are skipped by a scalar `lax.cond`, so the
  10-iteration and 1-iteration timings share one executable and one compile.
- The XLA persistent compilation cache is enabled (.jax_cache/), so reruns on
  the same machine skip the big compile entirely.
- The whole run executes on a worker thread under a wall-clock budget
  (BENCH_BUDGET_S, default 520 s). The main thread is a watchdog: on budget
  expiry or SIGTERM it prints the best result recorded so far and exits 0 —
  device-blocked syncs on the worker cannot delay it. A cheap chained-dispatch
  fallback measurement is recorded right after warmup, so a JSON line exists
  within seconds of the first executable being ready.
"""

import json
import os
import signal
import sys
import threading
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

TARGET_RTF = 0.01
SR = 22050
HOP = 256
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "520"))

HIFIGAN_V1 = {
    "resblock": "1",
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 512,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "gaussian_blur": {"p_blurring": 0.0},
}


from contextlib import nullcontext as _nullcontext


def _log(msg):
    print(f"[bench +{time.monotonic() - _T0:.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.monotonic()


def _result(rtf, method):
    return {
        "metric": "text_to_wav_rtf",
        "value": round(rtf, 6),
        "unit": "compute_s_per_audio_s",
        "vs_baseline": round(TARGET_RTF / rtf, 4),
        "method": method,
    }


def run_bench(state, deadline):
    from __graft_entry__ import _flagship_model_config
    from radtts_tpu.models.hifigan import (denoiser_apply, denoiser_init,
                                           hifigan_generator_apply,
                                           hifigan_generator_init)
    from radtts_tpu.models.radtts import (infer_durations, radtts_infer,
                                          radtts_init)
    from radtts_tpu.ops.invertible import precompute_inverses
    from radtts_tpu.text.processing import TextProcessing

    model_config = _flagship_model_config(small=False)
    # Init on the host CPU backend: eager init issues hundreds of tiny ops,
    # and per-dispatch overhead through the tunneled TPU backend has been
    # measured at up to ~1 s — init alone could eat the whole budget. One
    # batched device_put moves the finished pytrees over.
    _log("init on cpu")
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu) if cpu is not None else _nullcontext():
        params = radtts_init(jax.random.PRNGKey(0), model_config)
        params = precompute_inverses(params)
        vocoder = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
        denoiser = denoiser_init(vocoder)
    dev = jax.devices()[0]
    params, vocoder, denoiser = jax.device_put((params, vocoder, denoiser),
                                               dev)
    _log(f"init done, transferred to {dev}")

    tp = TextProcessing(
        "radtts", ["radtts_cleaners"], "radtts_tpu/text/assets/heteronyms",
        "radtts_tpu/text/assets/cmudict-0.7b", p_phoneme=1.0,
        handle_phoneme="word", handle_phoneme_ambiguous="ignore",
        prepend_space_to_text=True, append_space_to_text=True)
    text = ("It is well known that deep generative models have a rich "
            "latent space, and that it is possible to synthesize speech "
            "with controllable attributes.")
    encoded = np.asarray(tp.encode_text(text), dtype=np.int64)[None]
    speaker = jnp.zeros((1,), jnp.int32)

    # a typical LJS utterance budget: ~7 s of audio
    max_frames = 608  # 608 frames * 256 hop / 22050 Hz = 7.06 s
    g = model_config["n_group_size"]
    assert max_frames % (16 * g) == 0

    text_ids = jnp.asarray(encoded)

    def synthesize(rng, chain):
        # `chain` is a scalar derived from the previous iteration's audio;
        # folding it into the key makes iterations data-dependent so they
        # serialize on-device even if block_until_ready is a no-op (the
        # tunneled backend has been observed to return from it immediately).
        # The 1e-30 scale is numerically zero but NOT constant-foldable, so
        # XLA cannot sever the dependency (x & 0 or 0*x would be folded).
        rng = jax.random.fold_in(
            rng, (jnp.abs(chain) * 1e-30).astype(jnp.int32))
        r_dur, r_dec = jax.random.split(rng)
        dur = infer_durations(params, r_dur, speaker, text_ids,
                              sigma_dur=0.666)
        # rescale durations to exactly fill the static frame budget
        total = jnp.maximum(jnp.sum(dur), 1)
        dur = jnp.floor(dur * (max_frames / total)).astype(jnp.int32)
        dur = dur.at[:, -1].add(max_frames - jnp.sum(dur))
        out = radtts_infer(params, r_dec, speaker, text_ids, 0.8,
                           max_frames, dur=dur, sigma_f0=1.0,
                           sigma_energy=1.0)
        # mrf_impl defaults to "auto": the fused Pallas MRF kernel on TPU
        # (ops/pallas_mrf.py; interleaved A/B: 1.7-2.3x per stage vs XLA)
        audio = hifigan_generator_apply(vocoder, out["mel"])
        audio = denoiser_apply(denoiser, audio, strength=0.01)
        return audio, jnp.sum(audio[:, :8])

    n_iters = 10
    keys = jax.random.split(jax.random.PRNGKey(2), n_iters)

    # All iterations run INSIDE one jitted lax.scan: a single dispatch and a
    # single sync for the whole measurement. The tunneled backend's
    # per-dispatch overhead is large and weather-dependent (measured 0.7 ms
    # to >1 s on different days) — chaining eager dispatches folds that noise
    # into the metric. The trip count `n_active` is a RUNTIME operand: steps
    # with index >= n_active are skipped by a scalar lax.cond (a true HLO
    # conditional on TPU — the inactive branch does not execute), so the long
    # and short timings come from the SAME executable and only one program is
    # ever compiled. Each active step depends on the previous iteration's
    # audio through `chain`, so steps serialize on-device.
    @jax.jit
    def run_iters(n_active, chain0):
        def body(chain, inp):
            i, key = inp
            def active(c):
                audio, c2 = synthesize(key, c)
                return c2, audio[0, :4]
            def skip(c):
                return c, jnp.zeros((4,), jnp.float32)
            return lax.cond(i < n_active, active, skip, chain)
        return lax.scan(body, chain0, (jnp.arange(n_iters), keys))

    chain = jnp.zeros((), jnp.float32)

    def timecall(n_active):
        tic = time.perf_counter()
        # sync via scalar host transfer (authoritative even where
        # block_until_ready does not actually block)
        float(run_iters(n_active, chain)[0])
        return time.perf_counter() - tic

    # compile + warmup (persistent-cache hit on reruns)
    _log("tracing+compiling run_iters")
    t_compile = timecall(1)
    _log(f"compile+first-call done in {t_compile:.1f}s")

    audio_seconds = max_frames * HOP / SR

    # Fallback measurement FIRST: chained single-iteration dispatches.
    # Includes per-dispatch tunnel overhead, so it upper-bounds the true RTF
    # — an honest conservative number available within seconds of compile.
    t1 = [timecall(1) for _ in range(3)]
    state["best"] = _result(min(t1) / audio_seconds, "fallback")
    _log(f"fallback recorded: {state['best']}")

    # Difference method: the dispatch+sync round trip through the tunnel is
    # large and weather-dependent, so time the 10-iteration call against the
    # 1-iteration call of the same executable — identical overhead on both
    # cancels in the difference.
    t_long, t_short = [], list(t1)
    for _ in range(7):
        if time.monotonic() > deadline - 30:
            break
        t_long.append(timecall(n_iters))
        t_short.append(timecall(1))
        if len(t_long) >= 2:
            diff = min(t_long) - min(t_short)
            if diff > 0:
                rtf = diff / (n_iters - 1) / audio_seconds
                state["best"] = _result(rtf, "scan_diff")
    _log(f"final: {state['best']}")
    state["done"] = True


def main():
    state = {"best": None, "done": False}
    deadline = time.monotonic() + BUDGET_S

    def emit(signum=None, frame=None):
        if state["best"] is not None:
            print(json.dumps(state["best"]), flush=True)
            os._exit(0)
        os._exit(3)

    # The driver kills on its own timeout with SIGTERM; print what we have.
    signal.signal(signal.SIGTERM, emit)

    def guarded():
        try:
            run_bench(state, deadline)
        except BaseException:
            import traceback
            traceback.print_exc()
            state["done"] = True

    worker = threading.Thread(target=guarded, daemon=True)
    worker.start()
    while time.monotonic() < deadline and not state["done"]:
        time.sleep(0.5)
    emit()


if __name__ == "__main__":
    main()
