#!/usr/bin/env python
"""Stage-level RTF profiling on the attached chip: times each jitted stage of
the text->wav pipeline separately to locate the bottleneck."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_model_config
from bench import HIFIGAN_V1
from radtts_tpu.models.hifigan import (denoiser_apply, denoiser_init,
                                       hifigan_generator_apply,
                                       hifigan_generator_init)
from radtts_tpu.models.radtts import (encode_speaker, encode_text,
                                      infer_durations, preprocess_context,
                                      radtts_infer)
from radtts_tpu.ops.invertible import precompute_inverses
from radtts_tpu.ops.length_regulator import regulate_length


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready()
                 if hasattr(x, "block_until_ready") else x, out)
    tic = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready()
                 if hasattr(x, "block_until_ready") else x, out)
    return (time.perf_counter() - tic) / iters


def main():
    model_config = _flagship_model_config(small=False)
    from radtts_tpu.models.radtts import radtts_init
    params = radtts_init(jax.random.PRNGKey(0), model_config)
    params = precompute_inverses(params)
    vocoder = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    denoiser = denoiser_init(vocoder)

    N = 64
    max_frames = 608
    audio_s = max_frames * 256 / 22050
    text = jnp.asarray(np.random.default_rng(0).integers(1, 180, (1, N)))
    spk = jnp.zeros((1,), jnp.int32)
    rng = jax.random.PRNGKey(0)

    dur_val = jnp.full((1, N), max_frames // N, jnp.int32)

    stages = {}

    f_dur = jax.jit(lambda p, r, s, t: infer_durations(p, r, s, t))
    stages["durations(enc+dap)"] = timeit(f_dur, params, rng, spk, text)

    @jax.jit
    def f_decode(p, r, s, t, d):
        return radtts_infer(p, r, s, t, 0.8, max_frames, dur=d)["mel"]

    stages["decode(attrs+ctx+invflow)"] = timeit(
        f_decode, params, rng, spk, text, dur_val)

    mel = f_decode(params, rng, spk, text, dur_val)

    # decode sub-pieces
    @jax.jit
    def f_ctx(p, s, t, d):
        spk_vec = encode_speaker(p, s)
        txt_enc, _ = encode_text(p, t, None)
        texp = regulate_length(txt_enc, d, max_frames)
        out_lens = jnp.sum(d, axis=1)
        f0 = jnp.zeros((1, max_frames))
        e = jnp.zeros((1, max_frames))
        return preprocess_context(p, texp, spk_vec, out_lens, f0, e)

    stages["  ctx(enc+regulate+ctxlstm)"] = timeit(
        f_ctx, params, spk, text, dur_val)

    f_voc = jax.jit(lambda v, m: hifigan_generator_apply(v, m))
    stages["vocoder"] = timeit(f_voc, vocoder, mel)
    audio = f_voc(vocoder, mel)

    f_den = jax.jit(lambda dn, a: denoiser_apply(dn, a, 0.01))
    stages["denoiser"] = timeit(f_den, denoiser, audio)

    total = (stages["durations(enc+dap)"]
             + stages["decode(attrs+ctx+invflow)"] + stages["vocoder"]
             + stages["denoiser"])
    print(f"audio_s={audio_s:.2f}")
    for k, v in stages.items():
        print(f"{k:32s} {v*1000:8.2f} ms   rtf={v/audio_s:.5f}")
    print(f"{'TOTAL':32s} {total*1000:8.2f} ms   rtf={total/audio_s:.5f}")


if __name__ == "__main__":
    main()
