#!/usr/bin/env python
"""Serving-throughput benchmark: the full text->wav pipeline at batch sizes
1/4/8 (same 608-frame budget per item), scan+difference-method timed.
Reports seconds of audio synthesized per chip-second at each batch size."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bench import HIFIGAN_V1

BLOCKS = 4
N_ITERS = 8


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
    max_frames = 608
    audio_s = max_frames * 256 / 22050

    def make_run(B):
        text_ids = jnp.asarray(np.repeat(encoded, B, axis=0))
        speaker = jnp.zeros((B,), jnp.int32)

        def synthesize(params, vocoder, denoiser, rng, chain):
            rng = jax.random.fold_in(
                rng, (jnp.abs(chain) * 1e-30).astype(jnp.int32))
            r_dur, r_dec = jax.random.split(rng)
            dur = infer_durations(params, r_dur, speaker, text_ids,
                                  sigma_dur=0.666)
            total = jnp.maximum(jnp.sum(dur, axis=1, keepdims=True), 1)
            dur = jnp.floor(dur * (max_frames / total)).astype(jnp.int32)
            dur = dur.at[:, -1].add(max_frames - jnp.sum(dur, axis=1))
            out = radtts_infer(params, r_dec, speaker, text_ids, 0.8,
                               max_frames, dur=dur, sigma_f0=1.0,
                               sigma_energy=1.0)
            audio = hifigan_generator_apply(vocoder, out["mel"])
            audio = denoiser_apply(denoiser, audio, strength=0.01)
            return jnp.sum(audio[:, :8])

        @jax.jit
        def run(params, vocoder, denoiser, keys, chain0):
            def body(chain, key):
                return synthesize(params, vocoder, denoiser, key, chain), ()
            c, _ = lax.scan(body, chain0, keys)
            return c
        return run

    keys = jax.random.split(jax.random.PRNGKey(2), N_ITERS)
    chain = jnp.zeros((), jnp.float32)
    runs = {}
    for B in (1, 4, 8):
        runs[B] = make_run(B)
        for kk in (keys, keys[:1]):
            float(runs[B](params, vocoder, denoiser, kk, chain))
        print(f"B={B}: compiled", flush=True)

    res = {B: [] for B in runs}
    for b in range(BLOCKS):
        line = []
        for B, f in runs.items():
            tic = time.perf_counter()
            float(f(params, vocoder, denoiser, keys, chain))
            tl = time.perf_counter() - tic
            tic = time.perf_counter()
            float(f(params, vocoder, denoiser, keys[:1], chain))
            ts = time.perf_counter() - tic
            res[B].append((tl - ts) / (N_ITERS - 1))
            line.append(f"B{B} {(tl-ts)/(N_ITERS-1)*1e3:.2f}")
        print(f"block {b}: " + " | ".join(line) + " ms/iter", flush=True)

    for B in runs:
        per = min(res[B])
        thr = B * audio_s / per
        print(f"B={B}: {per*1e3:.2f} ms/batch -> {thr:.0f} s audio per "
              f"chip-second ({B/per:.1f} utt/s)")


if __name__ == "__main__":
    main()
