#!/usr/bin/env python
"""Sanity check: full text->wav pipeline timed with reps INSIDE one jitted
fori_loop (one dispatch, one sync) vs bench.py's chained-dispatch timing."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import _flagship_model_config
from bench import HIFIGAN_V1
from radtts_tpu.models.hifigan import (denoiser_apply, denoiser_init,
                                       hifigan_generator_apply,
                                       hifigan_generator_init)
from radtts_tpu.models.radtts import infer_durations, radtts_infer, radtts_init
from radtts_tpu.ops.invertible import precompute_inverses

REPS = 20
MAX_FRAMES = 608


def main():
    model_config = _flagship_model_config(small=False)
    params = precompute_inverses(radtts_init(jax.random.PRNGKey(0),
                                             model_config))
    vocoder = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    denoiser = denoiser_init(vocoder)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 180, (1, 64)).astype(np.int32))
    speaker = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(2)

    def synth_once(k):
        r_dur, r_dec = jax.random.split(k)
        dur = infer_durations(params, r_dur, speaker, text, sigma_dur=0.666)
        total = jnp.maximum(jnp.sum(dur), 1)
        dur = jnp.floor(dur * (MAX_FRAMES / total)).astype(jnp.int32)
        dur = dur.at[:, -1].add(MAX_FRAMES - jnp.sum(dur))
        out = radtts_infer(params, r_dec, speaker, text, 0.8, MAX_FRAMES,
                           dur=dur, sigma_f0=1.0, sigma_energy=1.0)
        audio = hifigan_generator_apply(vocoder, out["mel"])
        return denoiser_apply(denoiser, audio, strength=0.01)

    @jax.jit
    def run(k, chain):
        def body(i, carry):
            k, chain = carry
            k = jax.random.fold_in(
                k, i + (jnp.abs(chain) * 1e-30).astype(jnp.int32))
            audio = synth_once(k)
            return (k, jnp.sum(audio[:, :8]))
        return lax.fori_loop(0, REPS, body, (k, chain))

    t0 = time.perf_counter()
    k, chain = run(key, jnp.zeros((), jnp.float32))
    float(chain)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t = time.perf_counter()
    k, chain = run(k, chain)
    float(chain)
    dt = (time.perf_counter() - t) / REPS
    print(f"fori-loop e2e: {dt*1000:.2f} ms/utt  rtf={dt/ (MAX_FRAMES*256/22050):.6f}")


if __name__ == "__main__":
    main()
