#!/usr/bin/env python
"""Full-pipeline A/B: bench.py's exact scan program with mrf_impl="xla" vs
"pallas", interleaved in one process, difference-method timing (10-iter scan
minus 1-iter scan cancels the dispatch overhead)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bench import HIFIGAN_V1

BLOCKS = 5


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

    def make_run(mrf_impl):
        def synthesize(params, vocoder, denoiser, rng, chain):
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
            audio = hifigan_generator_apply(vocoder, out["mel"],
                                            mrf_impl=mrf_impl)
            audio = denoiser_apply(denoiser, audio, strength=0.01)
            return audio, jnp.sum(audio[:, :8])

        @jax.jit
        def run_iters(params, vocoder, denoiser, keys, chain0):
            def body(chain, key):
                audio, chain = synthesize(params, vocoder, denoiser, key,
                                          chain)
                return chain, audio[0, :4]
            return lax.scan(body, chain0, keys)
        return run_iters

    keys = jax.random.split(jax.random.PRNGKey(2), 10)
    chain = jnp.zeros((), jnp.float32)
    runs = {m: make_run(m) for m in ("xla", "pallas")}
    for m, f in runs.items():
        for kk in (keys, keys[:1]):
            float(f(params, vocoder, denoiser, kk, chain)[0])
        print(f"{m}: compiled", flush=True)

    res = {m: {"l": [], "s": []} for m in runs}
    for b in range(BLOCKS):
        line = []
        for m, f in runs.items():
            tic = time.perf_counter()
            float(f(params, vocoder, denoiser, keys, chain)[0])
            tl = time.perf_counter() - tic
            tic = time.perf_counter()
            float(f(params, vocoder, denoiser, keys[:1], chain)[0])
            ts = time.perf_counter() - tic
            res[m]["l"].append(tl)
            res[m]["s"].append(ts)
            line.append(f"{m} {(tl - ts) / 9 * 1e3:.2f}")
        print(f"block {b}: " + " | ".join(line) + " ms/iter", flush=True)

    for m in runs:
        per = (min(res[m]["l"]) - min(res[m]["s"])) / 9
        print(f"{m}: {per*1e3:.3f} ms/iter (rtf {per/7.0595:.6f})")


if __name__ == "__main__":
    main()
