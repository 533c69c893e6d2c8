#!/usr/bin/env python
"""Benchmark: LJSpeech-style text -> waveform real-time factor on one chip.

Runs the flagship RADTTS++ (config_ljs_dap model config) + HiFi-GAN v1
pipeline (durations -> attributes -> inverse flow -> vocoder -> denoiser),
jitted, steady-state timed (compile excluded).

Prints ONE JSON line:
  {"metric": "text_to_wav_rtf", "value": RTF, "unit": "compute_s_per_audio_s",
   "vs_baseline": target_rtf / measured_rtf}
The baseline target is RTF 0.01/chip (BASELINE.md north star; the reference
publishes no numbers).

Budget discipline (the round-2 bench timed out with nothing printed; the
first round-3 rewrite compiled ONE fused text->wav program and the tunnel's
REMOTE compile service dropped the request ~30 min in, every attempt, at
every unroll factor):
- The pipeline is timed as THREE stage programs (durations / decode /
  vocoder+denoiser), each of which compiles in seconds-to-minutes and is
  covered by the XLA persistent compilation cache (.jax_cache/). Per-stage
  times are measured with the tunnel-robust scan+difference method and
  summed — the stages are strictly sequential at inference, so the sum is
  the pipeline compute time (boundary transfers are device-resident).
- Each stage's repetitions run INSIDE one jitted lax.scan (one dispatch,
  one sync); the trip count is a runtime operand (scalar lax.cond skips
  inactive steps), so the 10-iter and 1-iter timings share one executable.
  The 1-iter time of the SAME program is subtracted (difference method) to
  cancel the weather-dependent dispatch+sync overhead (measured 0.7 ms to
  >1 s through the tunnel).
- Stage iterations are chained through a non-constant-foldable scalar so
  they serialize on-device even where block_until_ready lies.
- The whole run executes on a worker thread under a wall-clock budget
  (BENCH_BUDGET_S, default 520 s). The main thread is a watchdog: on budget
  expiry or SIGTERM it prints the best result recorded so far and exits 0.
  A chained-dispatch fallback is recorded as soon as all stages compile.
"""

import hashlib
import json
import os
import pickle
import signal
import sys
import threading
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
# The remote compile service drops very large programs (the 8x-unrolled
# recurrence bodies); unroll=1 compiles reliably and costs ~5% steady-state
# on the decode stage. Training keeps its own default.
os.environ.setdefault("RADTTS_SCAN_UNROLL", "1")

import jax
import jax.numpy as jnp
from jax import lax

from radtts_tpu.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache(
    default_path=os.path.join(_REPO, ".jax_cache"), cache_everything=True)
# NOTE: do NOT enable jax_explain_cache_misses here — in jax 0.9.0 its
# explanation machinery raises "not enough values to unpack" while tracing
# lax.cond under .lower() (verified in isolation), killing every stage.

TARGET_RTF = 0.01
SR = 22050
HOP = 256
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "520"))
N_ITERS = 10

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

_T0 = time.monotonic()


def _log(msg):
    print(f"[bench +{time.monotonic() - _T0:.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _result(rtf, method, stages=None, fresh=True):
    out = {
        "metric": "text_to_wav_rtf",
        "value": round(rtf, 6),
        "unit": "compute_s_per_audio_s",
        "vs_baseline": round(TARGET_RTF / rtf, 4),
        "method": method,
        "fresh": fresh,
    }
    if stages:
        out["stage_ms"] = {k: round(v * 1000, 3) for k, v in stages.items()}
    return out


_LAST = os.path.join(_REPO, ".bench_last.json")
_AOT_DIR = os.path.join(_REPO, ".bench_aot")


def get_runner(name, fn, example_args, fingerprint, deadline):
    """A compiled callable for jitted `fn` at `example_args`, backed by the
    serialized-executable store: load a previously serialized executable if
    one exists for this exact code fingerprint (no tunnel compile at all);
    else jit-lower + compile under a timeout with retries, then persist the
    zlib-compressed serialized executable for the next run. Keyed by source
    hash + device kind, so only THIS code's artifacts ever load."""
    import zlib
    path = os.path.join(_AOT_DIR, f"{name}-{fingerprint}.aot")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                blob = f.read()
            payload, in_tree, out_tree = pickle.loads(zlib.decompress(blob))
            from jax.experimental.serialize_executable import \
                deserialize_and_load
            loaded = _with_timeout(
                lambda: deserialize_and_load(payload, in_tree, out_tree),
                180, f"aot load {name}")
            _log(f"{name}: loaded serialized executable "
                 f"({len(blob) / 1e6:.1f} MB on disk)")
            return loaded
        except Exception as exc:
            _log(f"{name}: AOT load failed ({exc!r}); compiling")
    compiled = None
    for attempt in range(3):
        budget = min(300.0, max(60.0, deadline - time.monotonic() - 45))
        try:
            compiled = _with_timeout(
                lambda: fn.lower(*example_args).compile(),
                budget, f"compile {name}")
            break
        except Exception as exc:
            _log(f"{name} compile attempt {attempt + 1} failed: {exc!r}")
            if attempt == 2 or time.monotonic() > deadline - 60:
                raise
            time.sleep(5)
    try:
        from jax.experimental.serialize_executable import serialize
        os.makedirs(_AOT_DIR, exist_ok=True)
        blob = zlib.compress(pickle.dumps(serialize(compiled)), 6)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        _log(f"{name}: serialized executable persisted "
             f"({len(blob) / 1e6:.1f} MB)")
    except Exception as exc:  # persistence is an optimization
        _log(f"{name}: serialize failed ({exc!r})")
    return compiled


def _with_timeout(fn, timeout_s, desc):
    """Run fn() on a daemon thread with a wall-clock bound. The tunneled
    backend's compile/load RPCs HANG rather than error when the remote
    service drops a request (r03: the driver's run sat in one stage
    compile for 8+ minutes); an abandoned thread leaks, but the caller
    gets to retry or move on."""
    out, err = [], []

    def worker():
        try:
            out.append(fn())
        except BaseException as exc:  # noqa: BLE001 - report to caller
            err.append(exc)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    t.join(timeout_s)
    if out:
        return out[0]
    if err:
        raise err[0]
    raise TimeoutError(f"{desc} timed out after {timeout_s:.0f}s")


def _code_fingerprint(dev):
    """Key for the serialized-executable store: any source or environment
    change invalidates the artifacts, so a stale executable can never
    masquerade as a measurement of current code."""
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(str(getattr(dev, "device_kind", dev.platform)).encode())
    h.update(os.environ.get("RADTTS_SCAN_UNROLL", "").encode())
    h.update(os.environ.get("BENCH_WEIGHT_DTYPE", "").encode())
    pkg = os.path.join(_REPO, "radtts_tpu")
    for root, dirs, files in sorted(os.walk(pkg)):
        dirs.sort()
        for fn in sorted(files):
            if fn.endswith(".py"):
                with open(os.path.join(root, fn), "rb") as f:
                    h.update(fn.encode())
                    h.update(f.read())
    # every other input that shapes the benched programs
    for extra in (os.path.abspath(__file__),
                  os.path.join(_REPO, "__graft_entry__.py"),
                  os.path.join(_REPO, "configs", "config_ljs_dap.json")):
        with open(extra, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:20]


def _backend_reachable(timeout_s=120.0):
    """Initializing the tunneled backend HANGS (not errors) when the
    tunnel is down, and can also error fast (UNAVAILABLE when the tunnel
    actively refuses). One shared timed probe lives in __graft_entry__
    (its diagnostics go to stderr; stdout stays the one JSON line)."""
    from __graft_entry__ import _backend_device_count
    return _backend_device_count(timeout_s) > 0


def _load_stale_prior():
    """Last successful result, CLEARLY LABELED stale (method suffix AND
    fresh=false): the number describes the code as of measured_at, not
    necessarily this checkout. Read order: this machine's own last run
    (gitignored), then the committed .bench_baseline.json snapshot
    (survives a fresh checkout)."""
    for prior_path in (_LAST, os.path.join(_REPO, ".bench_baseline.json")):
        try:
            with open(prior_path) as f:
                prior = json.load(f)
            prior["method"] = (prior.get("method", "").split("|")[0]
                               + "|stale_prior_run")
            prior["fresh"] = False
            return prior, prior_path
        except Exception:
            continue
    return None, None


def run_bench(state, deadline):
    # Seed the result with the stale prior BEFORE anything that can hang:
    # the chip is unreachable during multi-hour tunnel outages and the
    # reachability probe itself costs up to its full timeout — if the
    # driver's budget expires mid-probe the watchdog must still have
    # something honest to print. Any fresh measurement overwrites this.
    prior, prior_path = _load_stale_prior()
    if prior is not None:
        state["best"] = prior
        _log(f"stale prior preloaded from {prior_path}: {prior}")
    if not _backend_reachable():
        if prior is None:
            _log("backend unreachable and no prior result recorded")
        else:
            _log("backend unreachable; emitting the stale prior")
        state["done"] = True
        return
    # The tunnel's FIRST device->host readback in a process pays a highly
    # variable first-contact handshake (measured 10 s to 540 s across one
    # day on the same terminal; every subsequent readback is ~30 ms).
    # That is a transport property, not model performance: absorb it
    # here, measure it, and credit the budget with it — otherwise a
    # 400 s handshake starves the measurement into a stale emission.
    # main()'s watchdog honors the credit via state["deadline_extra"].
    tic_hs = time.perf_counter()
    np.asarray(jax.device_put(np.ones((8,), np.float32))[:1])
    hs = time.perf_counter() - tic_hs
    state["deadline_extra"] = hs
    deadline += hs
    _log(f"first-readback handshake {hs:.1f}s (credited to budget)")

    from __graft_entry__ import _flagship_model_config
    from radtts_tpu.models.hifigan import (denoiser_apply, denoiser_init,
                                           hifigan_generator_apply,
                                           hifigan_generator_init)
    from radtts_tpu.models.radtts import _radtts_init_impl, \
        infer_durations, radtts_infer
    from radtts_tpu.ops.fold_norms import fold_norms
    from radtts_tpu.ops.invertible import precompute_inverses
    from radtts_tpu.text.processing import TextProcessing

    model_config = _flagship_model_config(small=False)
    dev = jax.devices()[0]
    fingerprint = _code_fingerprint(dev)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None

    # Init as ONE jitted program executed on the TPU device itself: eager
    # init on the host CPU + device_put of the pytrees measured 172 s
    # through the tunnel (r04); on-device the same work is one executable
    # (AOT-store-backed like the stages) and zero host->device bulk
    # transfer. The seed is a runtime operand so XLA cannot try to
    # constant-fold the whole init at compile time.
    _log("init on device (jitted)")

    def _init_all(seed):
        k = jax.random.PRNGKey(seed)
        k0, k1 = jax.random.split(k)
        p = _radtts_init_impl(k0, model_config)
        # fold the norm factorizations exactly as the serving path does
        # (synthesizer.py load-time fold): BIT-EQUAL outputs and a 16%
        # faster decode stage measured on chip (3.92 -> ~3.3 ms,
        # scripts/ab_fold_bf16.py r05). BENCH_WEIGHT_DTYPE=bfloat16
        # additionally benches the bf16 weight-storage variant (also
        # bit-equal; measured speed-neutral — footprint lever only)
        md = (jnp.bfloat16
              if os.environ.get("BENCH_WEIGHT_DTYPE", "") == "bfloat16"
              else None)
        p = fold_norms(precompute_inverses(p), matmul_dtype=md)
        voc = hifigan_generator_init(k1, HIFIGAN_V1)
        den = denoiser_init(voc)
        return p, voc, den

    init_run = get_runner("initp", jax.jit(_init_all), (jnp.int32(0),),
                          fingerprint, deadline)
    params, vocoder, denoiser = init_run(jnp.int32(0))
    jax.block_until_ready(params["embedding"]["table"])
    _log(f"init done on {dev}")

    tp = TextProcessing(
        "radtts", ["radtts_cleaners"], "radtts_tpu/text/assets/heteronyms",
        "radtts_tpu/text/assets/cmudict-0.7b", p_phoneme=1.0,
        handle_phoneme="word", handle_phoneme_ambiguous="ignore",
        prepend_space_to_text=True, append_space_to_text=True)
    text = ("It is well known that deep generative models have a rich "
            "latent space, and that it is possible to synthesize speech "
            "with controllable attributes.")
    encoded = np.asarray(tp.encode_text(text), dtype=np.int64)[None]
    _log("text frontend ready")

    # a typical LJS utterance budget: ~7 s of audio
    max_frames = 608  # 608 frames * 256 hop / 22050 Hz = 7.06 s
    g = model_config["n_group_size"]
    assert max_frames % (16 * g) == 0
    audio_seconds = max_frames * HOP / SR

    N = encoded.shape[1]
    n_mel = model_config["n_mel_channels"]

    # Fixed stage inputs, built ENTIRELY on the host CPU backend and moved
    # in one device_put (same rationale as init: each eager TPU op is a
    # tiny remote compile + dispatch, and a slow compile-service day turns
    # a dozen of them into minutes — measured: 8+ min before the r03 run's
    # budget expired here). Stage timing on TPU is data-independent
    # (static shapes, no data-dependent control flow), so random values at
    # realistic shapes measure the same program the real pipeline runs.
    rng_fix = np.random.default_rng(0)
    with jax.default_device(cpu) if cpu is not None else _nullcontext():
        speaker = jnp.zeros((1,), jnp.int32)
        text_ids = jnp.asarray(encoded)
        keys = jax.random.split(jax.random.PRNGKey(2), N_ITERS)
        dur0 = jnp.full((1, N), max_frames // N, jnp.int32)
        dur0 = dur0.at[:, -1].add(max_frames - int(jnp.sum(dur0)))
        mel0 = jnp.asarray(rng_fix.standard_normal(
            (1, max_frames, n_mel)).astype(np.float32))
        chain = jnp.zeros((), jnp.float32)
        one = jnp.int32(1)
        ten = jnp.int32(N_ITERS)
    (speaker, text_ids, keys, dur0, mel0, chain, one, ten) = jax.device_put(
        (speaker, text_ids, keys, dur0, mel0, chain, one, ten), dev)
    _log("fixed stage inputs on device")

    def _fold(key, chain):
        # numerically zero but NOT constant-foldable (x & 0 would fold):
        # makes every iteration depend on the previous one's output, so
        # steps serialize on-device even if block_until_ready is a no-op.
        return jax.random.fold_in(
            key, (jnp.abs(chain) * 1e-30).astype(jnp.int32))

    # --- stage bodies: (consts, key, chain) -> chain' -------------------
    def s_durations(consts, key, chain):
        p, = consts
        dur = infer_durations(p, _fold(key, chain), speaker, text_ids,
                              sigma_dur=0.666)
        total = jnp.maximum(jnp.sum(dur), 1)
        dur = jnp.floor(dur * (max_frames / total)).astype(jnp.int32)
        dur = dur.at[:, -1].add(max_frames - jnp.sum(dur))
        return chain + jnp.sum(dur).astype(jnp.float32) * 1e-30

    def s_decode(consts, key, chain):
        p, d0 = consts
        out = radtts_infer(p, _fold(key, chain), speaker, text_ids, 0.8,
                           max_frames, dur=d0, sigma_f0=1.0,
                           sigma_energy=1.0)
        return chain + jnp.sum(out["mel"][0, :2, :2]) * 1e-30

    def s_vocoder(consts, key, chain):
        voc, den, m0 = consts
        # mrf_impl defaults to "auto": the fused Pallas MRF kernel on TPU
        # (ops/pallas_mrf.py; interleaved A/B: 1.7-2.3x per stage vs XLA)
        audio = hifigan_generator_apply(voc, m0 + chain * 1e-30)
        audio = denoiser_apply(den, audio, strength=0.01)
        return chain + jnp.sum(audio[0, :8]) * 1e-30

    def scan_program(stage_fn):
        """One jitted program per stage; trip count is a runtime operand so
        the long and short timings share one executable. Params flow as jit
        ARGS (closure-captured pytrees bake into the HLO as constants and
        blow past the remote-compile request limit)."""
        @jax.jit
        def run(n_active, chain0, consts):
            def body(chain, inp):
                i, key = inp
                return lax.cond(i < n_active,
                                lambda c: stage_fn(consts, key, c),
                                lambda c: c, chain), ()
            return lax.scan(body, chain0,
                            (jnp.arange(N_ITERS), keys))[0]
        return run

    def timecall(run, n_active, consts):
        tic = time.perf_counter()
        # sync via scalar host transfer (authoritative even where
        # block_until_ready does not actually block)
        float(run(n_active, chain, consts))
        return time.perf_counter() - tic

    def get_stage_runner(name, stage_fn, consts, variant=""):
        """A callable run(n, chain, consts) for the stage, via the
        AOT-store-backed generic runner above."""
        return get_runner(f"stage-{name}{variant}", scan_program(stage_fn),
                          (one, chain, consts), fingerprint, deadline)

    # Stage order = share of pipeline time (r03 split: vocoder 9.6 ms,
    # decode 3.8 ms, durations 0.23 ms): if the budget dies early, the
    # stages that matter most are already measured fresh.
    stages = [
        ("vocoder", s_vocoder, (vocoder, denoiser, mel0)),
        ("decode", s_decode, (params, dur0)),
        ("durations", s_durations, (params,)),
    ]
    prior_stage_ms = dict((prior or {}).get("stage_ms") or {})

    def record_progress(t_single):
        """Best-available result after each stage becomes measurable:
        fully-fresh staged_fallback once all stages are in; before that, a
        hybrid of fresh single-iter times + the stale prior's stage
        timings (clearly labeled, fresh=false) when the prior has them."""
        fresh_ms = {n: min(v) for n, v in t_single.items() if v}
        if len(fresh_ms) == len(stages):
            rtf = sum(fresh_ms.values()) / audio_seconds
            state["best"] = _result(rtf, "staged_fallback")
            _log(f"fallback recorded: {state['best']}")
            return
        missing = [n for n, _, _ in stages if n not in fresh_ms]
        if all(n in prior_stage_ms for n in missing):
            total = (sum(fresh_ms.values())
                     + sum(prior_stage_ms[n] / 1000 for n in missing))
            tag = "+".join(sorted(fresh_ms))
            state["best"] = _result(
                total / audio_seconds,
                f"staged_partial_fresh[{tag}]|stale_prior_stages",
                fresh=False)
            _log(f"partial recorded: {state['best']}")

    # compile/load all stages; the serialized-executable store or the
    # persistent compile cache make reruns cheap
    t_single = {}
    runners = {}
    for name, stage_fn, consts in stages:
        _log(f"preparing stage {name}")
        run = get_stage_runner(name, stage_fn, consts)
        runners[name] = run
        t = timecall(run, one, consts)
        _log(f"stage {name} first-call {t:.1f}s")
        t_single[name] = [timecall(run, one, consts) for _ in range(2)]
        record_progress(t_single)
    stages = [(n, runners[n], c) for n, _, c in stages]

    def persist():
        try:
            if not state["best"].get("fresh"):
                return  # never launder a stale/hybrid result into a prior
            with open(_LAST, "w") as f:
                json.dump(dict(state["best"], measured_at=time.strftime(
                    "%Y-%m-%dT%H:%M:%S")), f)
        except Exception:
            pass

    # Difference method, stages interleaved within each round (the shared
    # chip's throttling drifts minute-to-minute).
    t_long = {n: [] for n, _, _ in stages}
    t_short = {n: list(t_single[n]) for n, _, _ in stages}
    per_iter = {}
    for _ in range(7):
        if time.monotonic() > deadline - 30:
            break
        for name, run, consts in stages:
            t_long[name].append(timecall(run, ten, consts))
            t_short[name].append(timecall(run, one, consts))
        ok = True
        for name, _, _ in stages:
            diff = min(t_long[name]) - min(t_short[name])
            if diff <= 0:
                ok = False
                break
            per_iter[name] = diff / (N_ITERS - 1)
        if ok:
            rtf = sum(per_iter.values()) / audio_seconds
            state["best"] = _result(rtf, "staged_scan_diff", per_iter)
    _log(f"staged (unroll=1): {state['best']}")
    persist()

    # Optional refinement: the decode stage retraced at scan unroll=8
    # (measured ~25% faster steady-state; the FULL pipeline at unroll=8
    # exceeds the remote compile service's request ceiling, a single stage
    # may not). Only attempted when the unroll=1 result is already recorded
    # and budget remains — a hung compile just means the watchdog emits the
    # result above. Cache-covered on reruns.
    if per_iter and time.monotonic() < deadline - 180:
        try:
            from radtts_tpu.ops.lstm import unroll_scope
            _log("preparing decode at unroll=8")
            with unroll_scope(8):
                run8 = get_stage_runner("decode", s_decode, (params, dur0),
                                        variant="_u8")
                timecall(run8, one, (params, dur0))
            _log("decode unroll=8 ready; timing")
            l8, s8 = [], []
            for _ in range(4):
                if time.monotonic() > deadline - 20:
                    break
                l8.append(timecall(run8, ten, (params, dur0)))
                s8.append(timecall(run8, one, (params, dur0)))
            diff8 = min(l8) - min(s8) if l8 and s8 else -1.0
            if 0 < diff8 / (N_ITERS - 1) < per_iter["decode"]:
                per_iter8 = dict(per_iter, decode=diff8 / (N_ITERS - 1))
                rtf = sum(per_iter8.values()) / audio_seconds
                state["best"] = _result(rtf, "staged_scan_diff_u8",
                                        per_iter8)
                persist()
        except Exception as exc:
            _log(f"unroll=8 refinement skipped: {exc!r}")

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
    # deadline_extra: measured first-contact transport handshake,
    # credited so a slow tunnel can't starve the measurement (see
    # run_bench). The driver's own process timeout stays the hard stop —
    # SIGTERM still emits best-so-far.
    while (time.monotonic() < deadline + state.get("deadline_extra", 0.0)
           and not state["done"]):
        time.sleep(0.5)
    emit()


if __name__ == "__main__":
    main()
