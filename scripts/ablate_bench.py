#!/usr/bin/env python
"""Stage attribution using bench.py's exact methodology: the same chained
synthesize program with later stages ablated. The difference between two
configs is that stage's true marginal cost inside the fused program."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_model_config
from bench import HIFIGAN_V1
from radtts_tpu.models.hifigan import (denoiser_apply, denoiser_init,
                                       hifigan_generator_apply,
                                       hifigan_generator_init)
from radtts_tpu.models.radtts import infer_durations, radtts_infer, radtts_init
from radtts_tpu.ops.invertible import precompute_inverses

MAX_FRAMES = 608
N_ITERS = 20


def main():
    model_config = _flagship_model_config(small=False)
    params = precompute_inverses(radtts_init(jax.random.PRNGKey(0),
                                             model_config))
    vocoder = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    denoiser = denoiser_init(vocoder)
    rng = np.random.default_rng(0)
    text_ids = jnp.asarray(rng.integers(1, 180, (1, 64)).astype(np.int32))
    speaker = jnp.zeros((1,), jnp.int32)

    def make(stages):
        @jax.jit
        def synthesize(params, vocoder, denoiser, rng, text_ids, chain):
            rng = jax.random.fold_in(
                rng, (jnp.abs(chain) * 1e-30).astype(jnp.int32))
            r_dur, r_dec = jax.random.split(rng)
            dur = infer_durations(params, r_dur, speaker, text_ids,
                                  sigma_dur=0.666)
            total = jnp.maximum(jnp.sum(dur), 1)
            dur = jnp.floor(dur * (MAX_FRAMES / total)).astype(jnp.int32)
            dur = dur.at[:, -1].add(MAX_FRAMES - jnp.sum(dur))
            if stages == "dur":
                return jnp.sum(dur).astype(jnp.float32)
            out = radtts_infer(params, r_dec, speaker, text_ids, 0.8,
                               MAX_FRAMES, dur=dur, sigma_f0=1.0,
                               sigma_energy=1.0)
            if stages == "mel":
                return jnp.sum(out["mel"][:, :2])
            audio = hifigan_generator_apply(vocoder, out["mel"])
            if stages == "voc":
                return jnp.sum(audio[:, :8])
            audio = denoiser_apply(denoiser, audio, strength=0.01)
            return jnp.sum(audio[:, :8])
        return synthesize

    keys = list(jax.random.split(jax.random.PRNGKey(2), N_ITERS))
    results = {}
    for stages in ("dur", "mel", "voc", "full"):
        f = make(stages)
        chain = jnp.zeros((), jnp.float32)
        chain = f(params, vocoder, denoiser, keys[0], text_ids, chain)
        float(chain)
        tic = time.perf_counter()
        for i in range(N_ITERS):
            chain = f(params, vocoder, denoiser, keys[i], text_ids, chain)
        float(chain)
        dt = (time.perf_counter() - tic) / N_ITERS
        results[stages] = dt
        print(f"{stages:6s} {dt*1000:8.2f} ms", flush=True)

    print(f"decode marginal  {1000*(results['mel']-results['dur']):8.2f} ms")
    print(f"vocoder marginal {1000*(results['voc']-results['mel']):8.2f} ms")
    print(f"denoiser marginal{1000*(results['full']-results['voc']):8.2f} ms")


if __name__ == "__main__":
    main()
