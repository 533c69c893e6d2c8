#!/usr/bin/env python
"""Vocoder-stage roofline (CPU tracing, no device): same max(MXU, HBM)
model as scripts/roofline_train.py, applied per upsample stage of the
production HiFi-GAN dispatch, to compare against the measured cuts
(scripts/profile_vocoder.py) and say which stage still has headroom.

Pallas MRF stages appear in the jaxpr as pallas_call, not
conv_general_dilated — so each stage is traced as its XLA-equivalent
resblock stack (mrf_impl='xla'): the FLOPs and boundary bytes are
identical (same math), only the execution strategy differs, which is
exactly what floor-vs-measured exposes.

Usage: JAX_PLATFORMS=cpu python scripts/roofline_vocoder.py
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench import HIFIGAN_V1
from radtts_tpu.models.hifigan import (denoiser_apply, denoiser_init,
                                       hifigan_generator_init)
from radtts_tpu.ops.flops import mxu_records
from scripts.profile_vocoder import gen_prefix

T_MEL = 608
PEAK_BF16 = 197e12
HBM_BW = 819e9
PASS_T = 2 * 128 ** 3 / PEAK_BF16


def mxu_floor(m, n, k, batch):
    passes = (math.ceil(m / 128) * math.ceil(n / 128)
              * math.ceil(k / 128) * batch)
    return passes * PASS_T


def floor_of(fn, *args):
    recs = mxu_records(fn, *args)
    fl = sum(r["flops"] * r["trips"] for r in recs)
    mxu = sum(r["trips"] * mxu_floor(r["m"], r["n"], r["k"], r["batch"])
              for r in recs)
    hbm = sum(r["trips"] * r["bytes"] / HBM_BW for r in recs)
    lo = sum(r["trips"] * max(
        mxu_floor(r["m"], r["n"], r["k"], r["batch"]),
        r["bytes"] / HBM_BW) for r in recs)
    return fl, mxu, hbm, lo


def main():
    voc = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    den = denoiser_init(voc)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, T_MEL, 80)).astype(np.float32))

    prev = (0.0,) * 4
    print(f"{'cut':>6} | {'GFLOPs':>7} | {'mxu ms':>7} | {'hbm ms':>7} | "
          f"{'floor ms':>8} | {'marginal floor':>14}")
    rows = []
    for name, n_st, post, d in [("pre", 0, False, False),
                                ("st0", 1, False, False),
                                ("st1", 2, False, False),
                                ("st2", 3, False, False),
                                ("st3", 4, False, False),
                                ("post", 4, True, False),
                                ("den", 4, True, True)]:
        def cut(v, dn, m):
            y = gen_prefix(v, m, n_st, post, impls=["xla"] * n_st)
            if d:
                y = denoiser_apply(dn, y, strength=0.01)
            return y
        cur = floor_of(cut, voc, den, mel)
        marg = cur[3] - prev[3]
        print(f"{name:>6} | {cur[0] / 1e9:>7.1f} | {cur[1] * 1e3:>7.2f} | "
              f"{cur[2] * 1e3:>7.2f} | {cur[3] * 1e3:>8.2f} | "
              f"{marg * 1e3:>13.2f}")
        rows.append((name, cur, marg))
        prev = cur


if __name__ == "__main__":
    main()
