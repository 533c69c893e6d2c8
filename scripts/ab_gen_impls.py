#!/usr/bin/env python
"""Interleaved A/B of the FULL HiFi-GAN generator under each MRF impl at
the flagship shape (608-frame mel): xla vs pallas (narrow-stage fused
kernel) vs fold (time-folded narrow stages) vs fold+wide-pallas env combo.
Same discipline as the other ab_* scripts: N reps inside one jitted
fori_loop, trivial-body loop subtracted."""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bench import HIFIGAN_V1
from radtts_tpu.models.hifigan import (hifigan_generator_apply,
                                       hifigan_generator_init)

N = 50
BLOCKS = 8
T = 608


def timecall(f, *args):
    t = time.perf_counter()
    float(np.asarray(f(*args)).ravel()[0])
    return time.perf_counter() - t


def main():
    rng = np.random.default_rng(0)
    voc = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    mel0 = jnp.asarray(rng.standard_normal((1, T, 80)).astype(np.float32))

    def loop(impl):
        @jax.jit
        def f(v, m):
            def it(i, m):
                y = hifigan_generator_apply(v, m + i * 1e-30,
                                            mrf_impl=impl)
                return m + jnp.mean(y) * 1e-30
            return lax.fori_loop(0, N, it, m)
        return f

    impls = ["xla", "pallas", "fold"]

    @jax.jit
    def f_triv(v, m):
        def it(i, m):
            return m * 1.0000001 + i * 1e-30
        return lax.fori_loop(0, N, it, m)

    # parity across impls at the full-generator level
    ref = np.asarray(jax.jit(
        lambda v, m: hifigan_generator_apply(v, m, mrf_impl="xla"))(voc,
                                                                    mel0))
    for impl in impls[1:]:
        got = np.asarray(jax.jit(
            lambda v, m: hifigan_generator_apply(v, m, mrf_impl=impl))(
                voc, mel0))
        print(f"{impl}: parity max-abs {np.abs(got - ref).max():.3e}",
              flush=True)

    fns = {impl: loop(impl) for impl in impls}
    timecall(f_triv, voc, mel0)
    for impl in impls:
        timecall(fns[impl], voc, mel0)  # compile+warm

    times = {impl: [] for impl in impls}
    base = []
    for b in range(BLOCKS):
        base.append(timecall(f_triv, voc, mel0))
        for impl in impls:
            times[impl].append(timecall(fns[impl], voc, mel0))
    b0 = min(base)
    for impl in impls:
        print(f"{impl:8s} {(min(times[impl]) - b0) / N * 1e3:.3f} ms "
              f"per generator call (base {b0 * 1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
