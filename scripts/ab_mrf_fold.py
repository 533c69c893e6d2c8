#!/usr/bin/env python
"""Interleaved A/B on the live chip: time-folded MRF stages
(ops/folded_conv.py — F frames packed into channels so the narrow C=64/32
stages run 128-wide MXU matmuls) vs plain XLA vs the fused Pallas kernel,
at the real flagship stage shapes (608-frame utterance). Same measurement
discipline as ab_pallas_mrf.py: all N reps inside one jitted fori_loop,
trivial-body loop subtracted to cancel the tunnel's dispatch overhead."""

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
from radtts_tpu.ops.folded_conv import (fold_time, resblock1_apply_folded,
                                        unfold_time)
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

    cases = [(2, 77824, 64, 1536), (3, 155648, 32, 1024)]
    for stage, T, C, tile in cases:
        F = 128 // C
        x0 = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))
        group = voc["resblocks"][stage]
        w = mrf_weights_from_params(group)

        def xla_mrf(x):
            xs = jnp.zeros_like(x)
            for j, block in enumerate(group):
                xs = xs + _resblock1_apply(block, x, RK[j], RD[j])
            return xs / 3

        def fold_mrf(x):
            X = fold_time(x, F)
            Xs = jnp.zeros_like(X)
            for j, block in enumerate(group):
                Xs = Xs + resblock1_apply_folded(block, X, RK[j], RD[j], F)
            return unfold_time(Xs / 3, F)

        def loop(body):
            @jax.jit
            def f(x):
                def it(i, x):
                    y = body(x + i * 1e-30)
                    return x + jnp.mean(y) * 1e-30
                return lax.fori_loop(0, N, it, x)
            return f

        f_triv = loop(lambda x: x * 1.0000001)
        f_xla = loop(xla_mrf)
        f_pal = loop(lambda x: pallas_mrf(x, w, tile=tile))
        f_fold = loop(fold_mrf)

        ya = np.asarray(jax.jit(xla_mrf)(x0))
        yf = np.asarray(jax.jit(fold_mrf)(x0))
        print(f"stage {stage} C={C}: fold parity max-abs "
              f"{np.abs(ya - yf).max():.3e}", flush=True)

        for f in (f_triv, f_xla, f_pal, f_fold):
            timecall(f, x0)  # compile+warm

        tt, tx, tp, tf = [], [], [], []
        for b in range(BLOCKS):
            tt.append(timecall(f_triv, x0))
            tx.append(timecall(f_xla, x0))
            tp.append(timecall(f_pal, x0))
            tf.append(timecall(f_fold, x0))
        base = min(tt)
        print(f"stage {stage} C={C} T={T} F={F}: "
              f"xla {(min(tx) - base) / N * 1e3:.3f} ms  "
              f"pallas {(min(tp) - base) / N * 1e3:.3f} ms  "
              f"fold {(min(tf) - base) / N * 1e3:.3f} ms per call "
              f"(dispatch+trivial base {base * 1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
