#!/usr/bin/env python
"""Where does the narrow Pallas MRF's 1.5x-over-roofline residual live?

roofline_vocoder.py charges the MXU dots and boundary HBM; the C=64
stage measures 1.72 ms vs a 1.12 ms floor. The un-charged in-kernel work
is (a) the pltpu.roll window building (~126 rolls of the (P, C) buffer
per tile per MRF) and (b) the lrelu/where VPU passes. This harness
ablates (a): a "noroll" variant monkeypatches the roll to identity —
numerically WRONG but the same dot/VPU schedule — so

    roll cost = t(baseline) - t(noroll).

bf16 buffers (which would halve that traffic) are NOT lowerable on this
toolchain: Mosaic's dynamic_rotate is 32-bit-only ("Rotate with
non-32-bit data") and bitcast-to-u32 workarounds hit "Changing bitwidths
not supported" — both measured 2026-08-20, hence this indirect probe.

Method: bench.py's scan-difference (all reps inside one jitted lax.scan
with a runtime trip count; long-minus-short cancels dispatch weather).

Verdicts (v5e, 2026-08-20, isolated stage programs at the flagship bench
shapes):
  C64  baseline 1.42-1.50 ms | noroll 1.26-1.28 | sliceroll 1.58 (worse)
  C128 baseline 1.03-1.08 ms | noroll 0.61-0.85 | sliceroll 1.05 (flat)
  taps-per-dot 1.25/5/10 MB slabs: flat under interleaved timing (the
  one 0.956 ms reading did not reproduce: base 1.066 vs t5M 1.075 min
  over 6 interleaved rounds).
So window building is 0.17-0.23 ms/stage of real cost, but every
cheaper formulation available to this toolchain either does not lower
or times the same — the residual over the roofline is intrinsic to
rotate-based windowing plus the VPU passes, and the production kernel
stays as-is.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from radtts_tpu.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache(
    default_path=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"), cache_everything=True)

from radtts_tpu.ops import pallas_mrf as M  # noqa: E402

N_ITERS = 30
ROUNDS = 4
# C=64 / C=128 stage shapes at the flagship bench utterance (T_mel=608),
# production tiles per models/hifigan.py.
CASES = [("C64", 77824, 64, 1536), ("C128", 38912, 128, 1024)]


def make_weights(rng, C):
    ws = []
    for k in (3, 7, 11):
        ws.append({
            "w1": jnp.asarray(rng.standard_normal((3, k, C, C)),
                              jnp.float32) * (0.3 / np.sqrt(k * C)),
            "b1": jnp.zeros((3, C), jnp.float32),
            "w2": jnp.asarray(rng.standard_normal((3, k, C, C)),
                              jnp.float32) * (0.3 / np.sqrt(k * C)),
            "b2": jnp.zeros((3, C), jnp.float32),
        })
    return ws


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# on {dev}", file=sys.stderr, flush=True)
    real_roll = M._roll_rows
    for name, T, C, tile in CASES:
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((1, T, C)), jnp.float32), dev)
        ws = jax.device_put(make_weights(rng, C), dev)
        chain0 = jax.device_put(jnp.zeros((), jnp.float32), dev)

        def program():
            def stage(chain):
                y = M.pallas_mrf(x + chain * 1e-30, ws, tile=tile)
                return chain + jnp.sum(y.ravel()[:4]) * 1e-30

            @jax.jit
            def run(n_active, chain):
                def body(c, i):
                    return lax.cond(i < n_active, stage, lambda cc: cc,
                                    c), ()
                return lax.scan(body, chain, jnp.arange(N_ITERS))[0]
            return run

        def slice_roll(buf, s):
            # the same rotation as static slices + sublane concat —
            # bit-equal; probes whether Mosaic lowers this cheaper than
            # tpu.dynamic_rotate
            if s == 0:
                return buf
            return jnp.concatenate([buf[s:], buf[:s]], axis=0)

        real_taps = M._conv_taps

        def taps_variant(target):
            def _conv_taps(buf, w, b, offsets, taps_per_dot=None):
                P_, C_ = buf.shape
                taps = taps_per_dot or max(
                    1, int(target / (P_ * C_ * 4)))
                y = None
                for j0 in range(0, len(offsets), taps):
                    jj = offsets[j0:j0 + taps]
                    cols = [M._roll_rows(buf, (-o) % P_) for o in jj]
                    win = (jnp.concatenate(cols, axis=1)
                           if len(cols) > 1 else cols[0])
                    part = jax.lax.dot_general(
                        win.astype(w.dtype),
                        w[j0 * C_:(j0 + len(cols)) * C_],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    y = part if y is None else y + part
                return y + b
            return _conv_taps

        one, n = jnp.int32(1), jnp.int32(N_ITERS)
        variants = [("baseline", real_roll, real_taps),
                    ("taps1.25M", real_roll, taps_variant(1.25e6)),
                    ("taps5M", real_roll, taps_variant(5e6)),
                    ("taps10M", real_roll, taps_variant(10e6))]
        if os.environ.get("AB_ROLL_VARIANTS") == "1":
            variants[1:1] = [("noroll", lambda buf, s: buf, real_taps),
                             ("sliceroll", slice_roll, real_taps)]
        for vname, roll, tapsfn in variants:
            M._roll_rows = roll
            M._conv_taps = tapsfn
            M.pallas_mrf.clear_cache()   # inner-jit jaxpr caches the roll
            run = program()
            tic = time.perf_counter()
            float(run(one, chain0))
            print(f"#   {name} {vname} compile+first "
                  f"{time.perf_counter() - tic:.1f}s",
                  file=sys.stderr, flush=True)
            best = float("inf")
            for _ in range(ROUNDS):
                t1 = time.perf_counter(); float(run(one, chain0))
                t1 = time.perf_counter() - t1
                tn = time.perf_counter(); float(run(n, chain0))
                tn = time.perf_counter() - tn
                best = min(best, (tn - t1) / (N_ITERS - 1))
            print(f"{name} {vname}: {best * 1e3:.3f} ms", flush=True)
    M._roll_rows = real_roll


if __name__ == "__main__":
    main()
