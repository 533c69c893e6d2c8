#!/usr/bin/env python
"""Interleaved A/B on the live chip: XLA MRF vs pallas_mrf_wide (per-
resblock bf16-weight invocations) at the C=256 upsample-stage shape of the
flagship pipeline (608-frame utterance -> T=4864 after the first 8x).
Same methodology as ab_pallas_mrf.py: all reps inside one jitted
fori_loop, trivial-body loop calibrates the dispatch overhead."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bench import HIFIGAN_V1
from radtts_tpu.models.hifigan import (hifigan_generator_init,
                                       _resblock1_apply)
from radtts_tpu.ops.pallas_mrf import (mrf_weights_from_params, pallas_mrf,
                                       pallas_mrf_wide)

N = 100
BLOCKS = 8
RK = (3, 7, 11)
RD = ((1, 3, 5),) * 3


def timecall(f, *args):
    t = time.perf_counter()
    float(np.asarray(f(*args)).ravel()[0])
    return time.perf_counter() - t


def main():
    rng = np.random.default_rng(0)
    voc = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)

    stage, T, C = 0, 4864, 256
    x0 = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))
    group = voc["resblocks"][stage]
    w = mrf_weights_from_params(group)

    def xla_mrf(x):
        xs = jnp.zeros_like(x)
        for j, block in enumerate(group):
            xs = xs + _resblock1_apply(block, x, RK[j], RD[j])
        return xs / 3

    def loop(body):
        @jax.jit
        def f(x):
            def it(i, x):
                y = body(x + i * 1e-30)
                return x + jnp.mean(y) * 1e-30
            return lax.fori_loop(0, N, it, x)
        return f

    variants = [("xla", xla_mrf)]
    for tile in (256, 512, 1024):
        variants.append((f"wide_bf16_t{tile}",
                         lambda x, t=tile: pallas_mrf_wide(x, w, tile=t)))

    # parity on chip (vs fp32 XLA; bf16 weights -> ~1% expected)
    ya = np.asarray(jax.jit(xla_mrf)(x0))
    for name, body in variants[1:]:
        try:
            yb = np.asarray(jax.jit(body)(x0))
            rel = np.abs(ya - yb).max() / (np.abs(ya).max() + 1e-12)
            print(f"{name}: parity rel-max {rel:.3e}", flush=True)
        except Exception as exc:
            print(f"{name}: FAILED {exc!r}", flush=True)
            variants = [v for v in variants if v[0] != name]

    fs = []
    f_triv = loop(lambda x: x * 1.0000001)
    timecall(f_triv, x0)
    for name, body in variants:
        f = loop(body)
        try:
            timecall(f, x0)  # compile+warm
            fs.append((name, f))
        except Exception as exc:
            print(f"{name}: loop compile FAILED {exc!r}", flush=True)

    times = {name: [] for name, _ in fs}
    base_t = []
    for b in range(BLOCKS):
        base_t.append(timecall(f_triv, x0))
        for name, f in fs:
            times[name].append(timecall(f, x0))
    base = min(base_t)
    for name, _ in fs:
        ms = (min(times[name]) - base) / N * 1e3
        print(f"{name}: {ms:.3f} ms per call "
              f"(dispatch+trivial base {base*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
