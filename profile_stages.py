#!/usr/bin/env python
"""Stage-level RTF profiling on the attached chip.

Times each jitted stage of the text->wav pipeline with the tunnel-robust
methodology (docs/DESIGN.md §8): all repetitions run INSIDE one jitted
lax.scan (one dispatch), and an 1-repetition run of the same program is
subtracted (the difference method) — per-dispatch overhead through the
tunnel has been measured anywhere from 0.7 ms to >1 s with tenant load,
so neither chained eager dispatches nor an independently measured sync
round-trip are trustworthy.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import _flagship_model_config
from bench import HIFIGAN_V1
from radtts_tpu.models.hifigan import (denoiser_apply, denoiser_init,
                                       hifigan_generator_apply,
                                       hifigan_generator_init)
from radtts_tpu.models.radtts import (infer_durations, radtts_infer,
                                      radtts_init)
from radtts_tpu.ops.invertible import precompute_inverses

N_REPS = 10
PAIRS = 5
MAX_FRAMES = 608
AUDIO_S = MAX_FRAMES * 256 / 22050


def staged(name, f, x0, *consts):
    """f: (x, i, *consts) -> y. All reps inside one scan; the per-rep cost
    is (T_long - T_short) / (N_REPS - 1), min over PAIRS pairs. Model
    params MUST flow through *consts, not closures — closure-captured
    pytrees get baked into the HLO as constants and blow past the
    remote-compile request limit."""
    t0 = time.perf_counter()

    @jax.jit
    def run(x, idxs, *consts):
        def body(x, i):
            return x + jnp.mean(f(x, i, *consts)) * 1e-30, ()
        x, _ = lax.scan(body, x, idxs)
        return x

    long_idx = jnp.arange(N_REPS)
    short_idx = jnp.arange(1)
    for idxs in (long_idx, short_idx):
        float(run(x0, idxs, *consts).ravel()[0])
    compile_s = time.perf_counter() - t0

    t_long, t_short = [], []
    for _ in range(PAIRS):
        t = time.perf_counter()
        float(run(x0, long_idx, *consts).ravel()[0])
        t_long.append(time.perf_counter() - t)
        t = time.perf_counter()
        float(run(x0, short_idx, *consts).ravel()[0])
        t_short.append(time.perf_counter() - t)
    dt = max(min(t_long) - min(t_short), 0.0) / (N_REPS - 1)
    print(f"{name:30s} {dt*1000:8.2f} ms  rtf={dt/AUDIO_S:.5f} "
          f"(compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    model_config = _flagship_model_config(small=False)
    params = precompute_inverses(
        radtts_init(jax.random.PRNGKey(0), model_config))
    vocoder = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    denoiser = denoiser_init(vocoder)

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 180, (1, 64)).astype(np.int32))
    spk = jnp.zeros((1,), jnp.int32)
    dur = jnp.full((1, 64), MAX_FRAMES // 64, jnp.int32)
    mel0 = jnp.asarray(
        rng.standard_normal((1, MAX_FRAMES, 80)).astype(np.float32))
    audio0 = jnp.asarray(
        rng.standard_normal((1, MAX_FRAMES * 256)).astype(np.float32) * 0.1)
    k = jax.random.PRNGKey(3)

    total = 0.0
    total += staged(
        "durations(enc+dap)",
        lambda x, i, p: infer_durations(
            p, jax.random.fold_in(k, i), spk, text,
            sigma_dur=0.666).astype(jnp.float32) + 1e-30 * jnp.mean(x),
        jnp.zeros((4,)), params)
    total += staged(
        "decode(attrs+ctx+invflow)",
        lambda x, i, p: radtts_infer(
            p, jax.random.fold_in(k, i), spk, text, 0.8, MAX_FRAMES,
            dur=dur, sigma_f0=1.0, sigma_energy=1.0)["mel"]
        + 1e-30 * jnp.mean(x),
        jnp.zeros((4,)), params)
    total += staged(
        "vocoder",
        lambda m, i, v: hifigan_generator_apply(v, m + 1e-30 * i),
        mel0, vocoder)
    total += staged(
        "denoiser",
        lambda a, i, d: denoiser_apply(d, a + 1e-30 * i, 0.01),
        audio0, denoiser)
    print(f"{'TOTAL':30s} {total*1000:8.2f} ms  rtf={total/AUDIO_S:.5f}")


if __name__ == "__main__":
    main()
