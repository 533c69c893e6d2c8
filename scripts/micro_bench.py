#!/usr/bin/env python
"""One-off microbenchmarks guiding round-2 kernel work (not part of the
library). Loops N_REPS times INSIDE one jitted program (lax.fori_loop with a
non-foldable data dependency) so tunnel dispatch overhead (~1-10 ms/call)
cannot pollute the numbers; one dispatch + one host sync per measurement."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N_REPS = 50


def timeit(name, f, x0, *consts, reps=N_REPS):
    """f: (x, *consts) -> y, same shape category as x not required; we fold
    a scalar of y back into x via a non-foldable epsilon."""

    @jax.jit
    def run(x, *consts):
        def body(i, x):
            y = f(x + i * jnp.zeros_like(x), *consts)
            leaf = jax.tree_util.tree_leaves(y)[0]
            return x + (jnp.mean(leaf) * 1e-30).astype(x.dtype)
        return lax.fori_loop(0, reps, body, x)

    t0 = time.perf_counter()
    r = run(x0, *consts)
    float(np.asarray(r).ravel()[0])
    compile_s = time.perf_counter() - t0
    t = time.perf_counter()
    r = run(r, *consts)
    float(np.asarray(r).ravel()[0])
    dt = (time.perf_counter() - t) / reps
    print(f"{name:34s} {dt*1000:8.3f} ms  (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    B, T, F, N = 1, 609, 513, 1024

    if which in ("all", "fft"):
        frames = jnp.asarray(
            rng.standard_normal((B, T, N)).astype(np.float32))
        mag = jnp.asarray(
            np.abs(rng.standard_normal((B, T, F))).astype(np.float32))
        ph = jnp.asarray((rng.random((B, T, F)) * 6 - 3).astype(np.float32))

        k = np.arange(F)[:, None] * np.arange(N)[None, :] * (2 * np.pi / N)
        cos_b = jnp.asarray(np.cos(k).T.astype(np.float32))   # (N, F)
        sin_b = jnp.asarray(np.sin(k).T.astype(np.float32))
        w = np.full((F,), 2.0, np.float32)
        w[0] = 1.0
        w[-1] = 1.0
        icos = jnp.asarray((np.cos(k) * w[:, None] / N).astype(np.float32))
        isin = jnp.asarray((np.sin(k) * w[:, None] / N).astype(np.float32))

        timeit("rfft(609x1024) mag+phase",
               lambda x: jnp.abs(jnp.fft.rfft(x, axis=-1)), frames)
        timeit("matmul-dft mag",
               lambda x: jnp.sqrt((x @ cos_b) ** 2 + (x @ sin_b) ** 2),
               frames)
        timeit("irfft",
               lambda m, p: jnp.fft.irfft(
                   lax.complex(m * jnp.cos(p), m * jnp.sin(p)), n=N, axis=-1),
               mag, ph)
        timeit("matmul-idft",
               lambda m, p: (m * jnp.cos(p)) @ icos - (m * jnp.sin(p)) @ isin,
               mag, ph)

    if which in ("all", "voc"):
        from bench import HIFIGAN_V1
        from radtts_tpu.models.hifigan import (hifigan_generator_apply,
                                               hifigan_generator_init)
        voc = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
        mel = jnp.asarray(rng.standard_normal((1, 608, 80)).astype(np.float32))

        def cast_leaf(x):
            return x.astype(jnp.bfloat16) if (
                hasattr(x, "dtype") and x.dtype == jnp.float32) else x
        voc16 = jax.tree_util.tree_map(cast_leaf, voc)

        timeit("vocoder fp32", lambda m, v: hifigan_generator_apply(v, m),
               mel, voc, reps=20)

        def bf16_apply(m, v):
            return hifigan_generator_apply(v, m.astype(jnp.bfloat16)).astype(
                jnp.float32)
        timeit("vocoder bf16", lambda m, v: bf16_apply(m, v), mel, voc16,
               reps=20)

        a32 = jax.jit(hifigan_generator_apply)(voc, mel)
        a16 = jax.jit(bf16_apply)(mel, voc16)
        print("  audio mae:", float(jnp.mean(jnp.abs(a32 - a16))),
              " ref max:", float(jnp.max(jnp.abs(a32))))


if __name__ == "__main__":
    main()
