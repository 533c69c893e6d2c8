"""Warm-model text->waveform synthesis engine.

Loads the RADTTS decoder + attribute predictors and the HiFi-GAN vocoder
once, then serves repeated synthesis requests off the same jitted stage
programs (reference pipeline anchor: inference.py:80-156 — durations ->
attributes -> inverse flow -> vocoder -> denoiser). `inference.py` (file
CLI) and `serve.py` (HTTP daemon) are both thin shells over this class.

Two-program design (docs/DESIGN.md section 2): durations are sampled
first, then the decode+vocoder stage runs under a static frame budget, so
XLA compiles one executable per (batch, text-bucket, frame-budget)
signature instead of one per utterance.

Knob discipline: sigmas and the denoiser strength are pure multipliers in
the traced graphs, so they are passed as DEVICE SCALARS — changing them
per request never retraces. `token_dur_scaling`, `f0_mean/std`,
`energy_mean/std` and `use_amp` sit behind Python-level control flow in
the model (radtts.py's reference semantics), so they are fixed at
construction; vary them by building another Synthesizer.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from radtts_tpu.data.dataset import data_factory
from radtts_tpu.models.hifigan import (denoiser_apply,
                                       hifigan_generator_apply)
from radtts_tpu.models.radtts import infer_durations, radtts_infer
from radtts_tpu.ops import amp as _amp
from radtts_tpu.ops.fold_norms import fold_norms
from radtts_tpu.ops.invertible import precompute_inverses
from radtts_tpu.train.checkpoint import load_radtts_for_inference
from radtts_tpu.vocoder_io import load_vocoder


def frame_budget(n_frames, group_size, multiple=16):
    m = multiple * group_size
    return ((int(n_frames) + m - 1) // m) * m


class Synthesizer:
    """One loaded model + vocoder; `synthesize()` per request batch."""

    def __init__(self, config, radtts_path, vocoder_path,
                 vocoder_config_path, *, use_amp=False, seed=1234,
                 token_dur_scaling=1.0, token_duration_max=100,
                 f0_mean=0.0, f0_std=0.0, energy_mean=0.0, energy_std=0.0,
                 bucket_single=False, data_parallel=1, weight_dtype=None,
                 aot_dir=None):
        model_config = config["model_config"]
        data_config = config["data_config"]

        # phase timings: the cold-start cost lives here and in _setup's
        # fold/upload — printed so `scripts/measure_ttfa.py` can attribute
        # the startup (measured quiet, flagship: vocoder ~4 s, checkpoint
        # ~6 s, dataset ~0.5 s, then the fold/upload phase dominated by
        # the tunnel's ~20 MB/s weight upload + its first-contact
        # handshake)
        tic = time.perf_counter()
        vocoder, denoiser = load_vocoder(vocoder_path, vocoder_config_path,
                                         aot_dir=aot_dir)
        t_voc = time.perf_counter()
        # template-first load: no radtts_init at inference time — the
        # checkpoint supplies every leaf, so the tree is built around a
        # jax.eval_shape template (seconds, not minutes at flagship
        # scale) and leaves stay host-side until the fold program uploads
        # them in one transfer (train/checkpoint.py:
        # load_radtts_for_inference)
        params, _ = load_radtts_for_inference(radtts_path, model_config)
        t_ck = time.perf_counter()

        # dataset object only for the speaker-id table + text encoding
        # (reference inference.py:100-110 does the same); same construction
        # path as the training loader's worker processes
        self.trainset = data_factory(data_config, "training_files")
        print(f"[synthesizer] load phases: vocoder {t_voc - tic:.1f}s, "
              f"checkpoint {t_ck - t_voc:.1f}s, "
              f"dataset {time.perf_counter() - t_ck:.1f}s", flush=True)
        self._setup(
            model_config, params, vocoder, denoiser,
            encode_fn=lambda t: np.asarray(self.trainset.get_text(t)),
            speaker_id_fn=self.trainset.get_speaker_id,
            sampling_rate=data_config["sampling_rate"],
            hop_length=data_config["hop_length"], use_amp=use_amp,
            seed=seed, token_dur_scaling=token_dur_scaling,
            token_duration_max=token_duration_max, f0_mean=f0_mean,
            f0_std=f0_std, energy_mean=energy_mean, energy_std=energy_std,
            bucket_single=bucket_single, data_parallel=data_parallel,
            weight_dtype=weight_dtype, aot_dir=aot_dir)

    @classmethod
    def from_parts(cls, model_config, params, vocoder, denoiser, *,
                   encode_fn, speaker_id_fn, sampling_rate=22050,
                   hop_length=256, use_amp=False, seed=1234,
                   token_dur_scaling=1.0, token_duration_max=100,
                   f0_mean=0.0, f0_std=0.0, energy_mean=0.0,
                   energy_std=0.0, bucket_single=False, data_parallel=1,
                   weight_dtype=None, aot_dir=None):
        """Build from in-memory objects (no checkpoint files): for tests
        and for embedding the engine next to a training loop (e.g. sample
        from params mid-fine-tune). `params` should already contain or be
        passed through precompute_inverses; it is applied here either way
        (idempotent). `encode_fn(text) -> int array`; `speaker_id_fn(name)
        -> int`."""
        self = object.__new__(cls)
        self.trainset = None
        self._setup(model_config, params, vocoder, denoiser,
                    encode_fn=encode_fn, speaker_id_fn=speaker_id_fn,
                    sampling_rate=sampling_rate, hop_length=hop_length,
                    use_amp=use_amp, seed=seed,
                    token_dur_scaling=token_dur_scaling,
                    token_duration_max=token_duration_max, f0_mean=f0_mean,
                    f0_std=f0_std, energy_mean=energy_mean,
                    energy_std=energy_std, bucket_single=bucket_single,
                    data_parallel=data_parallel, weight_dtype=weight_dtype,
                    aot_dir=aot_dir)
        return self

    def _setup(self, model_config, params, vocoder, denoiser, *, encode_fn,
               speaker_id_fn, sampling_rate, hop_length, use_amp, seed,
               token_dur_scaling, token_duration_max, f0_mean, f0_std,
               energy_mean, energy_std, bucket_single, data_parallel=1,
               weight_dtype=None, aot_dir=None):
        self.model_config = model_config
        self.sampling_rate = sampling_rate
        self.hop_length = hop_length
        self.group_size = model_config["n_group_size"]
        self.use_amp = use_amp
        self.token_dur_scaling = token_dur_scaling
        self.token_duration_max = token_duration_max
        self.f0_mean, self.f0_std = f0_mean, f0_std
        self.energy_mean, self.energy_std = energy_mean, energy_std
        # bucket_single: pad single-text requests to the same 16-token
        # buckets as batches (padded == exact: tests/test_batched_inference)
        # so a long-running server compiles a BOUNDED set of text-length
        # programs instead of one per distinct length. Off by default —
        # the file CLI keeps exact single-item shapes.
        self.bucket_single = bucket_single
        # data_parallel=N: shard the request batch over an N-device 'data'
        # mesh (weights replicated) — the serving-scale deployment path
        # proven by tests/test_parallel.py::test_dp_inference_matches_
        # single_device, now user-launchable (inference.py/serve.py
        # --data_parallel). Batches pad to a multiple of N by repeating
        # the last item (padding changes sampling draws for non-multiple
        # batches — acceptable for stochastic synthesis; exact batches
        # are bit-identical to data_parallel=1).
        self.data_parallel = int(data_parallel)
        if self.data_parallel > 1:
            from radtts_tpu.parallel.mesh import make_mesh
            devs = jax.devices()
            if len(devs) < self.data_parallel:
                raise ValueError(
                    f"data_parallel={self.data_parallel} but only "
                    f"{len(devs)} devices are visible")
            self.mesh = make_mesh(n_data=self.data_parallel, n_model=1,
                                  devices=devs[:self.data_parallel])
            self._dp_sharding = NamedSharding(self.mesh, P("data"))
            self._repl = NamedSharding(self.mesh, P())
            vocoder = jax.device_put(vocoder, self._repl)
            denoiser = jax.device_put(denoiser, self._repl)
        else:
            self.mesh = self._dp_sharding = self._repl = None
            # the converters return HOST (numpy) trees so loading costs
            # one transfer, not one dispatch per leaf (convert.py:t2j) —
            # but they must land on the device exactly ONCE here: numpy
            # leaves passed to a jitted stage re-upload on EVERY call
            # (measured: warm TTFA 0.14 s -> 2.4 s when this was missed)
            vocoder, denoiser = jax.device_put((vocoder, denoiser))
        self.vocoder, self.denoiser = vocoder, denoiser
        # fold norm factorizations once at load (exact — the reference's
        # remove_norms, radtts.py:732-750; measured on chip: BIT-EQUAL to
        # the factorized tree and 16% faster decode, 3.92 -> ~3.3 ms,
        # scripts/ab_fold_bf16.py). --weight_dtype bfloat16 additionally
        # stores conv kernels bf16: also bit-equal on TPU at DEFAULT
        # matmul precision, but measured speed-neutral — see
        # _resolve_weight_dtype for why it stays an opt-in footprint
        # lever rather than the 'auto' default.
        self.weight_dtype = self._resolve_weight_dtype(weight_dtype)
        md = (jnp.bfloat16 if self.weight_dtype == "bfloat16" else None)
        # aot_dir: persist compiled stage executables to disk and reload
        # them in later processes (radtts_tpu/aot_store.py — the bench.py
        # .bench_aot mechanism, now on the serving path). Kills the cold
        # TTFA: a fresh serve.py process loads executables in ~1 s
        # instead of re-compiling every stage through the tunnel
        # (measured 51.4 s cold, scripts/measure_ttfa.py r04). The store
        # only activates on TPU backends (see aot_store.store_enabled).
        import json as _json

        from radtts_tpu.aot_store import AOTStore
        self._aot = AOTStore.open(
            aot_dir,
            extra=(_json.dumps(model_config, sort_keys=True, default=str),
                   bool(use_amp), token_dur_scaling, token_duration_max,
                   f0_mean, f0_std, energy_mean, energy_std,
                   self.weight_dtype, self.data_parallel),
            log=lambda m: print(f"[synthesizer] {m}", flush=True))
        # one jitted program for the whole load-time rewrite: eager
        # leaf-by-leaf folding costs one tunneled dispatch per norm
        # collapse (same rationale as the jitted precompute_inverses)
        fold_jit = jax.jit(
            lambda p: fold_norms(precompute_inverses(p), matmul_dtype=md))
        if self._aot is not None:
            fold_jit = self._aot.wrap("fold", fold_jit)
        tic = time.perf_counter()
        # explicit host->device transfer FIRST, so the upload is pinned
        # here (startup) rather than inside the AOT fold call. Measured
        # on the tunneled v5e (warm client, readback-synced): the 917 MB
        # flagship tree moves at ~20 MB/s regardless of shape — 395
        # arrays 44 s, one packed array 52 s — so upload time is
        # transport-bound and packing does not help; what matters is
        # that it completes before the first request (readback below).
        params = jax.device_put(params)
        self.params = fold_jit(params)
        # force the fold (and its ~1 GB argument upload) to COMPLETE now,
        # not inside the first request: block_until_ready can be a no-op
        # on tunneled transports (see bench.py), but a host readback of a
        # program output is authoritative — the readback returning implies
        # the whole fold executed, hence every weight is device-resident.
        # Same for the vocoder/denoiser transfer: reading the bias
        # spectrum anchors that stream. Without this, cold TTFA silently
        # absorbed the upload (measured 48.5 s vs ~20 s). CPU backends
        # skip the forcing: transfers are local (nothing to pin), and
        # under RADTTS_AOT_FORCE a store-reloaded CPU executable cannot
        # execute at all (tests/test_aot_store.py::
        # test_synthesizer_aot_roundtrip covers exactly that laziness).
        if jax.default_backend() != "cpu":
            np.asarray(jnp.ravel(
                jax.tree_util.tree_leaves(self.params)[0])[:1])
            jax.block_until_ready((self.vocoder, self.denoiser))
            np.asarray(jnp.ravel(self.denoiser["bias_spec"])[:1])
        print(f"[synthesizer] fold+upload {time.perf_counter() - tic:.1f}s",
              flush=True)
        if self._repl is not None:
            self.params = jax.device_put(self.params, self._repl)
        self._encode_fn = encode_fn
        self._speaker_id_fn = speaker_id_fn
        self.rng = jax.random.PRNGKey(seed)
        self._dur_fn = jax.jit(self._durations)
        if self._aot is not None:
            self._dur_fn = self._aot.wrap("dur", self._dur_fn)
        # per-instance decode-program LRU (NOT functools.lru_cache on the
        # method: a class-level cache keyed on `self` would pin every
        # discarded Synthesizer's params + executables for process life).
        # Bounded: a long-running server sees a new frame budget per
        # distinct duration bucket, and each entry pins a compiled
        # decode+vocoder executable.
        from collections import OrderedDict
        self._decode_cache = OrderedDict()
        self._decode_cache_max = 32

    @staticmethod
    def _resolve_weight_dtype(weight_dtype):
        """Normalize the weight_dtype knob to 'float32' | 'bfloat16'.

        'auto'/None -> float32. Measured on chip (scripts/ab_fold_bf16.py,
        TPU v5e, flagship decode, 2026-08-20, WN heads perturbed away
        from their vacuous zero init): bf16-stored folded weights are
        BIT-EQUAL to fp32 storage at DEFAULT matmul precision (the MXU
        truncates fp32 operands to bf16 either way) but speed-NEUTRAL —
        fp32, bf16, and bf16+amp decode all time 3.2-3.5 ms across
        repeated A/Bs (the conv weight streams overlap the serialized
        LSTM/DAP scans and are off the critical path; decode roofline:
        scripts/roofline_decode.py). bfloat16 therefore stays an opt-in
        HBM-footprint lever (halves resident conv-weight bytes), not a
        speed default."""
        if weight_dtype in ("float32", jnp.float32):
            return "float32"
        if weight_dtype in ("bfloat16", jnp.bfloat16):
            return "bfloat16"
        if weight_dtype not in (None, "auto"):
            raise ValueError(f"weight_dtype={weight_dtype!r}: expected "
                             "'auto', 'float32' or 'bfloat16'")
        return "float32"

    def _put(self, x):
        """Shard a batch-leading array over the data mesh (identity when
        data_parallel == 1)."""
        if self._dp_sharding is None:
            return x
        return jax.device_put(x, self._dp_sharding)

    # --- text / speakers -------------------------------------------------
    def encode(self, text):
        return np.asarray(self._encode_fn(text))

    def speaker_id(self, name):
        return self._speaker_id_fn(name)

    # --- jitted stage bodies ---------------------------------------------
    def _durations(self, params, rng, spk_text, text_ids, sigma_dur,
                   in_lens=None):
        with _amp.scope(self.use_amp):
            return infer_durations(
                params, rng, spk_text, text_ids, sigma_dur=sigma_dur,
                token_dur_scaling=self.token_dur_scaling,
                token_duration_max=self.token_duration_max,
                in_lens=in_lens)

    def _decode_fn(self, max_frames):
        cached = self._decode_cache.get(max_frames)
        if cached is not None:
            self._decode_cache.move_to_end(max_frames)
            return cached

        def fn(params, vocoder, denoiser, rng, spk, spk_attr, text_ids,
               dur, in_lens, sigma, sigma_f0, sigma_energy, denoise):
            with _amp.scope(self.use_amp):
                out = radtts_infer(
                    params, rng, spk, text_ids, sigma, max_frames, dur=dur,
                    sigma_f0=sigma_f0, sigma_energy=sigma_energy,
                    speaker_id_attributes=spk_attr, f0_mean=self.f0_mean,
                    f0_std=self.f0_std, energy_mean=self.energy_mean,
                    energy_std=self.energy_std, in_lens=in_lens)
            # replicate the last valid frame into the static padding so the
            # vocoder's receptive field sees no garbage at the boundary
            total = jnp.sum(dur, axis=1)
            t = jnp.arange(max_frames)
            idx = jnp.minimum(t[None, :], total[:, None] - 1)
            mel = jnp.take_along_axis(out["mel"], idx[:, :, None], axis=1)
            audio = hifigan_generator_apply(vocoder, mel)
            audio = denoiser_apply(denoiser, audio, strength=denoise)
            return out, audio
        jitted = jax.jit(fn)
        if self._aot is not None:
            # max_frames is a trace-time constant with the SAME input
            # signature across budgets, so it must be part of the store
            # key, not just the arg signature
            jitted = self._aot.wrap(f"dec{max_frames}", jitted)
        self._decode_cache[max_frames] = jitted
        if len(self._decode_cache) > self._decode_cache_max:
            self._decode_cache.popitem(last=False)
        return jitted

    # --- public ------------------------------------------------------------
    def synthesize(self, texts, speaker, *, speaker_text=None,
                   speaker_attributes=None, sigma=0.8, sigma_tkndur=0.666,
                   sigma_f0=1.0, sigma_energy=1.0, denoising_strength=0.0,
                   trim=True):
        """Synthesize a batch of texts for one speaker.

        Returns (wavs, aux): `wavs` is a list of float32 numpy arrays (one
        per text, trimmed to its own duration budget unless trim=False);
        `aux` has per-item 'f0', 'energy_avg', 'dur', 'n_frames'. Batches
        pad to a 16-token bucket — the masked encoder makes padded results
        equal to the exact-length path (tests/test_batched_inference.py).
        """
        if isinstance(texts, str):
            texts = [texts]
        encs = [self.encode(t) for t in texts]
        B_real = len(encs)
        if self.data_parallel > 1 and B_real % self.data_parallel:
            encs = encs + [encs[-1]] * (
                self.data_parallel - B_real % self.data_parallel)
        lens = np.array([len(e) for e in encs], np.int32)
        B = len(encs)
        if B == 1 and not self.bucket_single:
            N, lens_arg = int(lens[0]), None
        else:
            N = ((int(lens.max()) + 15) // 16) * 16
            lens_arg = self._put(jnp.asarray(lens))
        text_b = np.zeros((B, N), np.int64)
        for j, e in enumerate(encs):
            text_b[j, : len(e)] = e
        text_b = self._put(jnp.asarray(text_b))

        def spk_arr(name, default):
            sid = default if name is None else self.speaker_id(name)
            return self._put(
                jnp.broadcast_to(jnp.asarray(np.array([sid])), (B,)))

        sid = self.speaker_id(speaker)
        spk = spk_arr(None, sid)
        spk_text = spk_arr(speaker_text, sid)
        spk_attr = spk_arr(speaker_attributes, sid)

        self.rng, r_dur, r_dec = jax.random.split(self.rng, 3)
        dur = self._dur_fn(self.params, r_dur, spk_text, text_b,
                           jnp.float32(sigma_tkndur), in_lens=lens_arg)
        totals = np.asarray(jnp.sum(dur, axis=1))
        if (totals < 1).any():  # untrained/degenerate duration guard
            valid = np.arange(N)[None, :] < lens[:, None]
            bump = (totals < 1)[:, None] & valid
            dur = dur + jnp.asarray(bump.astype(np.int32))
            totals = np.asarray(jnp.sum(dur, axis=1))
        max_frames = frame_budget(totals.max(), self.group_size)
        out, audio = self._decode_fn(max_frames)(
            self.params, self.vocoder, self.denoiser, r_dec, spk, spk_attr,
            text_b, dur, lens_arg, jnp.float32(sigma),
            jnp.float32(sigma_f0), jnp.float32(sigma_energy),
            jnp.float32(denoising_strength))
        audio = np.asarray(audio)
        wavs = [audio[j, : int(totals[j]) * self.hop_length] if trim
                else audio[j] for j in range(B_real)]
        aux = {"dur": np.asarray(dur)[:B_real],
               "n_frames": totals[:B_real]}
        for k in ("f0", "energy_avg"):  # absent on attribute-less configs
            if k in out:
                aux[k] = np.asarray(out[k])[:B_real]
        return wavs, aux

    def synthesize_long(self, text, speaker, *, max_tokens, gap_ms=120.0,
                        **kwargs):
        """Synthesize one text of unbounded length: split at sentence
        boundaries into chunks of <= max_tokens encoded symbols
        (text/chunking.py, same splitter as inference.py
        --long_text_chunk), run the chunks as ONE batched dispatch, and
        join the trimmed waveforms with `gap_ms` of silence. Returns
        (wav, aux) where aux carries the batched per-chunk arrays plus
        'n_chunks'."""
        from radtts_tpu.text.chunking import split_text_to_chunks

        parts = split_text_to_chunks(
            text, lambda s: len(self.encode(s)), max_tokens)
        wavs, aux = self.synthesize(parts, speaker, **kwargs)
        aux["n_chunks"] = len(parts)
        gap = np.zeros(int(self.sampling_rate * gap_ms / 1000.0),
                       np.float32)
        joined = []
        for j, w in enumerate(wavs):
            joined.append(w)
            if j < len(wavs) - 1:
                joined.append(gap)
        return np.concatenate(joined), aux
