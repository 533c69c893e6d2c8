#!/usr/bin/env python
"""Interleaved A/B on the live chip: XLA MRF resblock stack vs the fused
Pallas kernel, at the real stage shapes of the flagship pipeline (608-frame
utterance). All N reps run INSIDE one jitted fori_loop (single dispatch),
and a trivial-body loop calibrates the dispatch overhead to subtract —
the tunnel's per-dispatch cost has been observed anywhere from 0.7 to
60+ ms depending on the day."""

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
from radtts_tpu.ops.pallas_mrf import mrf_weights_from_params, pallas_mrf

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

    cases = [(3, 155648, 32, 1024, 1536), (1, 38912, 128, 1024, 1536)]
    for stage, T, C, tile, tile2 in cases:
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

        f_triv = loop(lambda x: x * 1.0000001)
        f_xla = loop(lambda x: pallas_mrf(x, w, tile=tile))
        f_pal = loop(lambda x: pallas_mrf(x, w, tile=tile2))

        # parity on chip
        ya = np.asarray(jax.jit(xla_mrf)(x0))
        yb = np.asarray(pallas_mrf(x0, w, tile=tile))
        print(f"stage {stage} C={C}: parity max-abs "
              f"{np.abs(ya - yb).max():.3e}", flush=True)

        for f in (f_triv, f_xla, f_pal):
            timecall(f, x0)  # compile+warm

        tt, tx, tp = [], [], []
        for b in range(BLOCKS):
            tt.append(timecall(f_triv, x0))
            tx.append(timecall(f_xla, x0))
            tp.append(timecall(f_pal, x0))
        base = min(tt)
        xla_ms = (min(tx) - base) / N * 1e3
        pal_ms = (min(tp) - base) / N * 1e3
        print(f"stage {stage} C={C} T={T}: tile{tile} {xla_ms:.3f} ms "
              f"tile{tile2} {pal_ms:.3f} ms per call "
              f"(dispatch+trivial base {base*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
