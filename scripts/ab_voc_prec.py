#!/usr/bin/env python
"""Interleaved A/B/C of HiFi-GAN generator numerics on the live chip:
  A: current fp32, DEFAULT conv precision
  B: bf16 activations+weights end-to-end (fp32 out)
  C: fp32, HIGHEST conv precision (detects whether DEFAULT already
     truncates to bf16 on this backend: if C is much slower than A,
     A was already riding the bf16 MXU path)
Alternates A,B,C per block to cancel chip-load drift; chained dispatches,
one sync per block."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from bench import HIFIGAN_V1
from radtts_tpu.models import hifigan
from radtts_tpu.models.hifigan import (hifigan_generator_apply,
                                       hifigan_generator_init)

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


def main():
    rng = np.random.default_rng(0)
    voc = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    mel = jnp.asarray(rng.standard_normal((1, 608, 80)).astype(np.float32))

    @jax.jit
    def gen_f32(m, i, v):
        y = hifigan_generator_apply(v, m + i * 1e-30)
        return m + jnp.mean(y) * 1e-30

    @jax.jit
    def gen_bf16(m, i, v):
        y = hifigan_generator_apply(v, (m + i * 1e-30).astype(jnp.bfloat16))
        return m + jnp.mean(y.astype(jnp.float32)) * 1e-30

    @jax.jit
    def gen_hi(m, i, v):
        with jax.default_matmul_precision("float32"):
            y = hifigan_generator_apply(v, m + i * 1e-30)
        return m + jnp.mean(y) * 1e-30

    # parity check: bf16 vs fp32 output error
    y32 = np.asarray(jax.jit(hifigan_generator_apply)(voc, mel))
    ybf = np.asarray(jax.jit(
        lambda v, m: hifigan_generator_apply(
            v, m.astype(jnp.bfloat16)).astype(jnp.float32))(voc, mel))
    print(f"bf16 vs fp32: max-abs {np.abs(y32 - ybf).max():.3e} "
          f"mae {np.abs(y32 - ybf).mean():.3e} (audio in [-1,1])",
          flush=True)

    a, b, c = [], [], []
    for blk in range(BLOCKS):
        t, mel = timed(gen_f32, mel, voc); a.append(t)
        t, mel = timed(gen_bf16, mel, voc); b.append(t)
        t, mel = timed(gen_hi, mel, voc); c.append(t)
        print(f"block {blk}: f32 {a[-1]*1e3:.2f} bf16 {b[-1]*1e3:.2f} "
              f"f32-HIGHEST {c[-1]*1e3:.2f} ms", flush=True)

    print(f"min: f32 {min(a)*1e3:.2f} bf16 {min(b)*1e3:.2f} "
          f"f32-HIGHEST {min(c)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
