#!/usr/bin/env python
"""Stage attribution with bench.py's exact scan methodology: the same
10-iteration in-jit scan, with suffixes of the pipeline ablated.
  full   = durations + decode + vocoder + denoiser
  novoc  = durations + decode (mel only)
  noden  = durations + decode + vocoder
Marginals give the true per-stage cost inside the fused program.
Interleaved across blocks to cancel chip drift."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bench import HIFIGAN_V1

REPS = 10
BLOCKS = 3


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
    speaker = jnp.zeros((1,), jnp.int32)
    max_frames = 608
    text_ids = jnp.asarray(encoded)

    def synthesize(mode, params, vocoder, denoiser, rng, chain):
        rng = jax.random.fold_in(
            rng, (jnp.abs(chain) * 1e-30).astype(jnp.int32))
        r_dur, r_dec = jax.random.split(rng)
        dur = infer_durations(params, r_dur, speaker, text_ids,
                              sigma_dur=0.666)
        total = jnp.maximum(jnp.sum(dur), 1)
        dur = jnp.floor(dur * (max_frames / total)).astype(jnp.int32)
        dur = dur.at[:, -1].add(max_frames - jnp.sum(dur))
        out = radtts_infer(params, r_dec, speaker, text_ids, 0.8,
                           max_frames, dur=dur, sigma_f0=1.0,
                           sigma_energy=1.0)
        if mode == "novoc":
            return jnp.sum(out["mel"][0, :8])
        audio = hifigan_generator_apply(vocoder, out["mel"])
        if mode == "noden":
            return jnp.sum(audio[:, :8])
        audio = denoiser_apply(denoiser, audio, strength=0.01)
        return jnp.sum(audio[:, :8])

    def make(mode):
        @jax.jit
        def run(params, vocoder, denoiser, keys, chain0):
            def body(chain, key):
                chain = synthesize(mode, params, vocoder, denoiser, key,
                                   chain)
                return chain, ()
            c, _ = lax.scan(body, chain0, keys)
            return c
        return run

    keys = jax.random.split(jax.random.PRNGKey(2), REPS)
    chain = jnp.zeros((), jnp.float32)
    fns = {m: make(m) for m in ("novoc", "noden", "full")}
    for m, f in fns.items():
        float(f(params, vocoder, denoiser, keys, chain))  # compile

    results = {m: [] for m in fns}
    for b in range(BLOCKS):
        line = []
        for m, f in fns.items():
            tic = time.perf_counter()
            float(f(params, vocoder, denoiser, keys, chain))
            t = (time.perf_counter() - tic) / REPS
            results[m].append(t)
            line.append(f"{m} {t*1e3:.2f}")
        print(f"block {b}: " + " | ".join(line), flush=True)

    mins = {m: min(v) for m, v in results.items()}
    print(f"\ndecode+durations: {mins['novoc']*1e3:.2f} ms")
    print(f"vocoder marginal: {(mins['noden']-mins['novoc'])*1e3:.2f} ms")
    print(f"denoiser marginal: {(mins['full']-mins['noden'])*1e3:.2f} ms")
    print(f"full: {mins['full']*1e3:.2f} ms")


if __name__ == "__main__":
    main()
