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
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

TARGET_RTF = 0.01
SR = 22050
HOP = 256

HIFIGAN_V1 = {
    "resblock": "1",
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 512,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "gaussian_blur": {"p_blurring": 0.0},
}


def main():
    from __graft_entry__ import _flagship_model_config
    from radtts_tpu.models.hifigan import (denoiser_apply, denoiser_init,
                                           hifigan_generator_apply,
                                           hifigan_generator_init)
    from radtts_tpu.models.radtts import (infer_durations, radtts_infer,
                                          radtts_init)
    from radtts_tpu.ops.invertible import precompute_inverses
    from radtts_tpu.text.processing import TextProcessing

    model_config = _flagship_model_config(small=False)
    params = radtts_init(jax.random.PRNGKey(0), model_config)
    params = precompute_inverses(params)
    vocoder = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    denoiser = denoiser_init(vocoder)

    tp = TextProcessing(
        "radtts", ["radtts_cleaners"], "radtts_tpu/text/assets/heteronyms",
        "radtts_tpu/text/assets/cmudict-0.7b", p_phoneme=1.0,
        handle_phoneme="word", handle_phoneme_ambiguous="ignore",
        prepend_space_to_text=True, append_space_to_text=True)
    text = ("It is well known that deep generative models have a rich "
            "latent space, and that it is possible to synthesize speech "
            "with controllable attributes.")
    encoded = np.asarray(tp.encode_text(text), dtype=np.int64)[None]
    N = encoded.shape[1]
    speaker = jnp.zeros((1,), jnp.int32)

    # a typical LJS utterance budget: ~7 s of audio
    max_frames = 608  # 608 frames * 256 hop / 22050 Hz = 7.06 s
    g = model_config["n_group_size"]
    assert max_frames % (16 * g) == 0

    @jax.jit
    def synthesize(params, vocoder, denoiser, rng, text_ids, chain):
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

    rng = jax.random.PRNGKey(2)
    text_ids = jnp.asarray(encoded)

    n_iters = 10
    keys = jax.random.split(rng, n_iters)

    # All iterations run INSIDE one jitted lax.scan: a single dispatch and a
    # single sync for the whole measurement. The tunneled backend's
    # per-dispatch overhead is large and weather-dependent (measured 0.7 to
    # 7.5 ms on different days) — chaining eager dispatches would fold that
    # noise into the metric. Each scan step still depends on the previous
    # iteration's audio through `chain`, so steps serialize on-device.
    @jax.jit
    def run_iters(params, vocoder, denoiser, keys, chain0):
        def body(chain, key):
            audio, chain = synthesize(params, vocoder, denoiser, key,
                                      text_ids, chain)
            return chain, audio[0, :4]
        return lax.scan(body, chain0, keys)

    # compile + warmup both trip counts; sync via scalar host transfer
    # (authoritative even where block_until_ready does not actually block)
    chain = jnp.zeros((), jnp.float32)
    for kk in (keys, keys[:1]):
        float(run_iters(params, vocoder, denoiser, kk, chain)[0])

    # Difference method: the dispatch+sync round trip through the tunnel is
    # large and weather-dependent (0.7 ms to 1+ s observed), so time the
    # 10-iteration scan against the 1-iteration scan — identical overhead
    # on both calls cancels in the difference.
    def timecall(kk):
        tic = time.perf_counter()
        float(run_iters(params, vocoder, denoiser, kk, chain)[0])
        return time.perf_counter() - tic

    t_long, t_short = [], []
    for _ in range(7):
        t_long.append(timecall(keys))
        t_short.append(timecall(keys[:1]))
    elapsed = max(min(t_long) - min(t_short), 1e-9) / (n_iters - 1)

    audio_seconds = max_frames * HOP / SR
    rtf = elapsed / audio_seconds
    print(json.dumps({
        "metric": "text_to_wav_rtf",
        "value": round(rtf, 6),
        "unit": "compute_s_per_audio_s",
        "vs_baseline": round(TARGET_RTF / rtf, 4),
    }))


if __name__ == "__main__":
    main()
