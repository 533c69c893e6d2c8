#!/usr/bin/env python
"""Interleaved A/B: LSTM scan unroll factor (1 vs 8) on the decode+attrs
part of the flagship pipeline (the vocoder is ablated so the serial scans
dominate). Difference-method timing inside one process."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import radtts_tpu.ops.lstm as lstm_mod

BLOCKS = 5


def main():
    from __graft_entry__ import _flagship_model_config
    from radtts_tpu.models.radtts import (infer_durations, radtts_infer,
                                          radtts_init)
    from radtts_tpu.ops.invertible import precompute_inverses
    from radtts_tpu.text.processing import TextProcessing

    model_config = _flagship_model_config(small=False)
    params = radtts_init(jax.random.PRNGKey(0), model_config)
    params = precompute_inverses(params)
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

    def synthesize(params, rng, chain):
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
        return jnp.sum(out["mel"][0, :8])

    def make_run(unroll):
        lstm_mod.SCAN_UNROLL = unroll

        @jax.jit
        def run(params, keys, chain0):
            def body(chain, key):
                return synthesize(params, key, chain), ()
            c, _ = lax.scan(body, chain0, keys)
            return c
        # force trace NOW while the module constant is set
        keys = jax.random.split(jax.random.PRNGKey(2), 10)
        chain = jnp.zeros((), jnp.float32)
        for kk in (keys, keys[:1]):
            float(run(params, kk, chain))
        return run

    keys = jax.random.split(jax.random.PRNGKey(2), 10)
    chain = jnp.zeros((), jnp.float32)
    runs = {}
    for u in (1, 8):
        runs[u] = make_run(u)
        print(f"unroll={u}: compiled", flush=True)

    res = {u: [] for u in runs}
    for b in range(BLOCKS):
        line = []
        for u, f in runs.items():
            tic = time.perf_counter()
            float(f(params, keys, chain))
            tl = time.perf_counter() - tic
            tic = time.perf_counter()
            float(f(params, keys[:1], chain))
            ts = time.perf_counter() - tic
            res[u].append((tl - ts) / 9)
            line.append(f"u{u} {(tl - ts) / 9 * 1e3:.2f}")
        print(f"block {b}: " + " | ".join(line) + " ms/iter", flush=True)

    for u in runs:
        print(f"unroll={u}: min {min(res[u])*1e3:.3f} ms/iter")


if __name__ == "__main__":
    main()
