#!/usr/bin/env python
"""Decode-stage A/B: factorized params (bench status quo) vs fold_norms
fp32 vs fold_norms bf16 weight storage vs bf16 weights + the inference
amp scope (pure-bf16 coupling stacks), at flagship size on the real chip.

Questions (VERDICT r04 item 1 + the round-5 decode roofline):
  1. parity — is the decode output with bf16-stored folded weights
     BIT-EQUAL to the fp32-stored folded output at DEFAULT matmul
     precision (the ops/fold_norms.py claim: the MXU truncates fp32
     operands to bf16 anyway)? Also: folded-fp32 vs factorized, and how
     far the amp (bf16 elementwise) variant drifts. The WN prediction
     heads are perturbed away from their zero init first — otherwise the
     couplings contribute nothing and every parity row is vacuous.
  2. speed — what does each variant cost, scan-difference timed at both
     unroll=1 and unroll=8 (the bench's refined decode method)? The
     decode roofline (scripts/roofline_decode.py) charges the WN conv
     pool 0.92 ms of HBM weight traffic; if halving it (bf16 weights /
     amp) does NOT move the measured time, the weight streams are
     overlapped with the serialized scans and are off the critical path.

Run ON THE CHIP (no JAX_PLATFORMS=cpu). Prints a summary table.
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

from __graft_entry__ import _flagship_model_config  # noqa: E402
from radtts_tpu.models.radtts import (_radtts_init_impl,  # noqa: E402
                                      radtts_infer)
from radtts_tpu.ops import amp as _amp  # noqa: E402
from radtts_tpu.ops.fold_norms import fold_norms  # noqa: E402
from radtts_tpu.ops.invertible import precompute_inverses  # noqa: E402
from radtts_tpu.ops.lstm import unroll_scope  # noqa: E402

N_ITERS = 10
ROUNDS = 5
MAX_FRAMES = 608


def main():
    model_config = _flagship_model_config(small=False)
    dev = jax.devices()[0]
    print(f"# on {dev}", file=sys.stderr, flush=True)

    def _init(seed):
        p = _radtts_init_impl(jax.random.PRNGKey(seed), model_config)
        return precompute_inverses(p)

    params = jax.jit(_init)(jnp.int32(0))
    jax.block_until_ready(params["embedding"]["table"])
    # The WN prediction heads are ZERO-initialized (reference
    # common.py:540-542): unperturbed, every coupling is a constant-scale
    # transform and the parity rows below compare programs whose WN
    # stacks are multiplied by zero — vacuously bit-equal. Perturb the
    # heads so parity measures the real decode compute path. Timing is
    # unaffected either way (zero weights still execute full convs).
    # sd 0.002, NOT larger: the head sums 1024 channels, so scale_un's sd
    # is ~sqrt(1024)*sd*act_rms — at 0.05 the tanh scaling saturates and
    # (z-b)/s compounds to overflow across the 8 inverse flows (measured:
    # NaN mels). 0.002 keeps s within a few percent of 1 while the WN
    # contribution stays far above bf16 resolution (~0.4%).
    rng_p = np.random.default_rng(17)
    for fl in params["flows"]:
        head = fl["affine"]["pred"]
        head = head["end"] if "end" in head else head["last"]
        head["w"] = head["w"] + jnp.asarray(
            rng_p.normal(0, 0.002, head["w"].shape).astype(np.float32))
    p_fold32 = jax.jit(lambda p: fold_norms(p))(params)
    p_fold16 = jax.jit(
        lambda p: fold_norms(p, matmul_dtype=jnp.bfloat16))(params)
    print("# params ready (factorized / fold32 / fold16)", file=sys.stderr,
          flush=True)

    from contextlib import nullcontext
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    rng_fix = np.random.default_rng(0)
    N = 160
    with jax.default_device(cpu) if cpu is not None else nullcontext():
        speaker = jnp.zeros((1,), jnp.int32)
        text_ids = jnp.asarray(
            rng_fix.integers(1, 180, size=(1, N)).astype(np.int64))
        keys = jax.random.split(jax.random.PRNGKey(2), N_ITERS)
        dur0 = jnp.full((1, N), MAX_FRAMES // N, jnp.int32)
        dur0 = dur0.at[:, -1].add(MAX_FRAMES - int(jnp.sum(dur0)))
        chain0 = jnp.zeros((), jnp.float32)
        one, ten = jnp.int32(1), jnp.int32(N_ITERS)
    (speaker, text_ids, keys, dur0, chain0, one, ten) = jax.device_put(
        (speaker, text_ids, keys, dur0, chain0, one, ten), dev)

    # ---- parity: one decode call per variant, same rng key -------------
    # fresh jit wrapper per (params, amp) variant: amp is a TRACE-time
    # mode, and fold32 / fold32+amp share call signatures — one shared
    # jit would silently reuse whichever executable compiled first
    def make_decode_once(use_amp):
        @jax.jit
        def decode_once(p, key):
            with _amp.scope(use_amp):
                out = radtts_infer(p, key, speaker, text_ids, 0.8,
                                   MAX_FRAMES, dur=dur0, sigma_f0=1.0,
                                   sigma_energy=1.0)
            return out["mel"]
        return decode_once

    k = jax.device_put(jax.random.PRNGKey(7), dev)
    mel_fac = np.asarray(make_decode_once(False)(params, k))
    mel_f32 = np.asarray(make_decode_once(False)(p_fold32, k))
    mel_f16 = np.asarray(make_decode_once(False)(p_fold16, k))
    mel_amp = np.asarray(make_decode_once(True)(p_fold16, k))
    scale = float(np.max(np.abs(mel_f32)))
    print(f"parity scale(max|mel|)={scale:.3f}")
    print(f"parity factorized-vs-fold32: max|d|="
          f"{np.max(np.abs(mel_fac - mel_f32)):.3e}")
    print(f"parity fold32-vs-fold16:     max|d|="
          f"{np.max(np.abs(mel_f32 - mel_f16)):.3e}  bit_equal="
          f"{bool((mel_f32 == mel_f16).all())}")
    print(f"parity fold32-vs-fold16+amp: max|d|="
          f"{np.max(np.abs(mel_f32 - mel_amp)):.3e}  mae="
          f"{np.mean(np.abs(mel_f32 - mel_amp)):.3e}")

    # ---- timing: scan-difference per variant ----------------------------
    def scan_program(p, use_amp):
        @jax.jit
        def run(n_active, chain, pp):
            def body(c, inp):
                i, key = inp

                def go(cc):
                    with _amp.scope(use_amp):
                        out = radtts_infer(
                            pp, jax.random.fold_in(
                                key,
                                (jnp.abs(cc) * 1e-30).astype(jnp.int32)),
                            speaker, text_ids, 0.8, MAX_FRAMES, dur=dur0,
                            sigma_f0=1.0, sigma_energy=1.0)
                    return cc + jnp.sum(out["mel"][0, :2, :2]) * 1e-30
                return lax.cond(i < n_active, go, lambda cc: cc, c), ()
            return lax.scan(body, chain, (jnp.arange(N_ITERS), keys))[0]
        return run

    def timecall(run, n, p):
        tic = time.perf_counter()
        float(run(n, chain0, p))
        return time.perf_counter() - tic

    variants = [("factorized", params, False), ("fold32", p_fold32, False),
                ("fold16", p_fold16, False),
                ("fold16+amp", p_fold16, True)]
    for unroll in (1, 8):
        runs = []
        with unroll_scope(unroll):
            for name, p, use_amp in variants:
                r = scan_program(p, use_amp)
                t = timecall(r, one, p)
                print(f"# u{unroll} {name} compile+first {t:.1f}s",
                      file=sys.stderr, flush=True)
                runs.append((name, r, p))
        t_long = {n: [] for n, _, _ in runs}
        t_short = {n: [] for n, _, _ in runs}
        for _ in range(ROUNDS):
            for name, r, p in runs:
                t_long[name].append(timecall(r, ten, p))
                t_short[name].append(timecall(r, one, p))
        for name, _, _ in runs:
            per = (min(t_long[name]) - min(t_short[name])) / (N_ITERS - 1)
            print(f"u{unroll} {name}: {per * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
