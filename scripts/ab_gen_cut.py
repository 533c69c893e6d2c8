#!/usr/bin/env python
"""Generator stage attribution by TRUNCATION: time the generator cut after
conv_pre, after each upsample stage, and the full net — all as one-per-cut
jitted chained programs on the same input. Marginal stage cost = difference
between successive cuts. Same methodology as bench.py (chained dispatch,
one sync per block), interleaved across blocks to cancel drift."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from bench import HIFIGAN_V1
from radtts_tpu.models.hifigan import (LRELU_SLOPE, conv_transpose1d_apply,
                                       hifigan_generator_init,
                                       _resblock1_apply)
from radtts_tpu.ops.conv import conv1d_apply

REPS = 10
BLOCKS = 4


def timed(f, x0, *consts):
    x = f(x0, 0, *consts)
    float(np.asarray(x).ravel()[0])
    t = time.perf_counter()
    for i in range(REPS):
        x = f(x, i, *consts)
    float(np.asarray(x).ravel()[0])
    return (time.perf_counter() - t) / REPS, x


def gen_prefix(params, mel, n_stages, with_post):
    meta = params["_meta"]
    rates = meta["upsample_rates"]
    kernels = meta["upsample_kernel_sizes"]
    rk = meta["resblock_kernel_sizes"]
    rd = meta["resblock_dilation_sizes"]
    x = conv1d_apply(params["conv_pre"], mel, padding=3)
    for i in range(n_stages):
        u, k = rates[i], kernels[i]
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = conv_transpose1d_apply(params["ups"][i], x, u, (k - u) // 2)
        xs = jnp.zeros_like(x)
        for j, block in enumerate(params["resblocks"][i]):
            xs = xs + _resblock1_apply(block, x, rk[j], rd[j])
        x = xs / len(rk)
    if with_post:
        x = jax.nn.leaky_relu(x)
        x = conv1d_apply(params["conv_post"], x, padding=3)
        x = jnp.tanh(x)
    return x


def main():
    rng = np.random.default_rng(0)
    voc = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    mel = jnp.asarray(rng.standard_normal((1, 608, 80)).astype(np.float32))

    cuts = {}
    for n in range(5):
        def make(n=n):
            @jax.jit
            def f(m, i, v):
                y = gen_prefix(v, m + i * 1e-30, n, False)
                return m + jnp.mean(y) * 1e-30
            return f
        cuts[f"st{n}"] = make()

    @jax.jit
    def full(m, i, v):
        y = gen_prefix(v, m + i * 1e-30, 4, True)
        return m + jnp.mean(y) * 1e-30
    cuts["full"] = full

    results = {k: [] for k in cuts}
    for b in range(BLOCKS):
        line = []
        for name, f in cuts.items():
            t, mel = timed(f, mel, voc)
            results[name].append(t)
            line.append(f"{name} {t*1e3:.2f}")
        print(f"block {b}: " + " | ".join(line), flush=True)

    mins = {k: min(v) for k, v in results.items()}
    print()
    prev = 0.0
    for name in cuts:
        print(f"{name}: {mins[name]*1e3:.2f} ms "
              f"(marginal {(mins[name]-prev)*1e3:+.2f})")
        prev = mins[name]


if __name__ == "__main__":
    main()
