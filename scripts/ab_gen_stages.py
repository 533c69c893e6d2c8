#!/usr/bin/env python
"""Per-stage timing of the HiFi-GAN generator on the live chip: each
upsample stage (convT + MRF resblocks) timed as its own jitted chained
program, plus the convT alone and the MRF alone per stage, to find where
the 17 ms actually goes. Interleaved across blocks to cancel drift."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from bench import HIFIGAN_V1
from radtts_tpu.models import hifigan
from radtts_tpu.models.hifigan import (conv_transpose1d_apply,
                                       hifigan_generator_init,
                                       _resblock1_apply)
from radtts_tpu.ops.conv import conv1d_apply

REPS = 10
BLOCKS = 3
T0 = 608


def timed(f, x0, *consts):
    x = f(x0, 0, *consts)
    float(np.asarray(x).ravel()[0])
    t = time.perf_counter()
    for i in range(REPS):
        x = f(x, i, *consts)
    float(np.asarray(x).ravel()[0])
    return (time.perf_counter() - t) / REPS, x


def main():
    rng = np.random.default_rng(0)
    voc = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    meta = voc["_meta"]
    rates = meta["upsample_rates"]
    kernels = meta["upsample_kernel_sizes"]
    rk = meta["resblock_kernel_sizes"]
    rd = meta["resblock_dilation_sizes"]

    # stage input shapes
    ch0 = 512
    shapes = []
    t = T0
    for i, u in enumerate(rates):
        cin = ch0 // (2 ** i)
        shapes.append((t, cin))
        t *= u

    variants = {}
    for i, (u, k) in enumerate(zip(rates, kernels)):
        ti, cin = shapes[i]
        cout = cin // 2
        x_up = jnp.asarray(
            rng.standard_normal((1, ti, cin)).astype(np.float32))
        x_mrf = jnp.asarray(
            rng.standard_normal((1, ti * u, cout)).astype(np.float32))

        def make_convT(i=i, u=u, k=k):
            @jax.jit
            def f(x, j, v):
                y = conv_transpose1d_apply(v["ups"][i], x + j * 1e-30, u,
                                           (k - u) // 2)
                return x + jnp.mean(y) * 1e-30
            return f

        def make_mrf(i=i):
            @jax.jit
            def f(x, j, v):
                xx = x + j * 1e-30
                xs = jnp.zeros_like(xx)
                for jj, block in enumerate(v["resblocks"][i]):
                    xs = xs + _resblock1_apply(block, xx, rk[jj], rd[jj])
                return x + jnp.mean(xs) * 1e-30
            return f

        variants[f"convT{i}"] = (make_convT(), x_up)
        variants[f"mrf{i}"] = (make_mrf(), x_mrf)

    results = {k: [] for k in variants}
    for b in range(BLOCKS):
        line = []
        for name, (f, x0) in variants.items():
            t, _ = timed(f, x0, voc)
            results[name].append(t)
            line.append(f"{name} {t*1e3:.2f}")
        print(f"block {b}: " + " | ".join(line), flush=True)

    total = 0.0
    for name, ts in results.items():
        print(f"{name}: {min(ts)*1e3:.2f} ms")
        total += min(ts)
    print(f"sum of stage minima: {total*1e3:.2f} ms")


if __name__ == "__main__":
    main()
