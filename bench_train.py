#!/usr/bin/env python
"""Training-step benchmark: steps/s, mel frames/s, and MFU on one chip
(reference trains with AMP, train.py:364,416-422; it publishes no
throughput numbers — BASELINE.md).

Runs the jitted full train step (forward + backward + RAdam update, MAS
binarization + CTC on) on the flagship config_ljs_dap model at B=16 and
LJS-typical sequence lengths.

Methodology (docs/DESIGN.md §8): all timed steps run INSIDE one jitted
lax.fori_loop whose trip count is a RUNTIME operand, so the long and
short timings come from the SAME executable — subtracting them cancels
dispatch+sync overhead without the cross-program noise that made earlier
two-executable readings unstable (round 2 recorded both 0.0325 s/step
and a negative difference from the same code). Steps serialize through
the params/opt_state carry. fori_loop (not scan+cond) because the cond's
select on the ~3-param-tree carry copied the trees every iteration:
profile_train.py measured 61.9 ms/step under scan+cond vs 58.6 under
fori for the identical step — ~3.3 ms of pure harness overhead the real
training loop (one executable call per step) never pays.

MFU is reported two ways:
- mfu_hlo: XLA cost-analysis FLOPs of the lowered program (counts every
  op XLA will run, and grades fp32 ops against the bf16 peak table);
- mfu_analytic: dot/conv FLOPs from the traced jaxpr (the conventional
  model-FLOPs numerator; backward ops appear in the grad jaxpr, so no
  fudge factor).

Prints ONE JSON line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))

import jax
import jax.numpy as jnp

from radtts_tpu.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache(
    default_path=os.path.join(_REPO, ".jax_cache"), cache_everything=True)

B, N, T = 16, 112, 512  # LJS-typical: ~5.9 s of audio per item

# bf16 MXU peak FLOP/s per chip generation (public cloud specs)
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}

_T0 = time.monotonic()


def _log(msg):
    print(f"[bench_train +{time.monotonic() - _T0:.1f}s] {msg}",
          file=sys.stderr, flush=True)


def chip_peak_flops():
    kind = jax.devices()[0].device_kind
    for key, peak in PEAK_FLOPS.items():
        if kind.lower().startswith(key.lower()):
            return peak, kind
    return 197e12, kind  # assume v5e-class if unknown


def main(use_amp, n_iters, state_dtype=None):
    n_iters = max(2, n_iters)  # difference method needs two trip counts
    from contextlib import nullcontext

    from __graft_entry__ import (_LOSS_WEIGHTS, _example_batch,
                                 _flagship_model_config)
    from radtts_tpu.models.radtts import radtts_init
    from radtts_tpu.train.optim import build_optimizer
    from radtts_tpu.train.trainer import (build_trainable_mask,
                                          make_train_step)

    model_config = _flagship_model_config(small=False)
    # init on the host CPU backend (eager init through the tunnel pays a
    # round trip per op), one device_put for the finished pytrees
    _log("init on cpu")
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu) if cpu is not None else nullcontext():
        params = radtts_init(jax.random.PRNGKey(0), model_config)
        optimizer = build_optimizer("RAdam", 1e-4, 1e-6, 1.0,
                                    state_dtype=state_dtype)
        mask = build_trainable_mask(params, "all", ())
        opt_state = optimizer.init(params)
        batch = _example_batch(0, B=B, N=N, T=T,
                               n_mel=model_config["n_mel_channels"])
    dev = jax.devices()[0]
    params, opt_state, batch = jax.device_put((params, opt_state, batch),
                                              dev)
    _log(f"init done, transferred to {dev}")

    step = make_train_step(model_config, _LOSS_WEIGHTS, 1.0, optimizer,
                           mask, use_amp=use_amp)
    keys = jax.random.split(jax.random.PRNGKey(1), n_iters)

    @jax.jit
    def run_steps(params, opt_state, batch, n_active):
        def body(i, carry):
            p, o, _ = carry
            p, o, total, _, _ = step(p, o, batch, keys[i], True, True)
            return (p, o, total)

        params, opt_state, total = jax.lax.fori_loop(
            0, n_active, body, (params, opt_state, jnp.float32(0)))
        return params, opt_state, total

    def timecall(n_active):
        tic = time.perf_counter()
        # sync via scalar host transfer (block_until_ready can lie through
        # the tunnel)
        float(run_steps(params, opt_state, batch, jnp.int32(n_active))[2])
        return time.perf_counter() - tic

    _log("compiling train-step scan")
    for attempt in range(3):
        try:
            t = timecall(1)
            break
        except Exception as exc:
            _log(f"compile attempt {attempt + 1} failed: {exc!r}")
            if attempt == 2:
                raise
            time.sleep(10)
    _log(f"compile+first-call {t:.1f}s")

    flops = flops_analytic = None
    try:
        # count FLOPs on ONE bare step (the fori harness is a dynamic-trip
        # while loop whose body XLA cost analysis cannot multiply out)
        cost = jax.jit(
            lambda p, o, b, k: step(p, o, b, k, True, True)).lower(
                params, opt_state, batch, keys[0]).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as exc:  # cost analysis is best-effort per backend
        _log(f"cost_analysis unavailable: {exc}")
    try:
        from radtts_tpu.ops.flops import count_matmul_flops
        flops_analytic = count_matmul_flops(
            lambda p, o, b, k: step(p, o, b, k, True, True),
            params, opt_state, batch, keys[-1])
    except Exception as exc:
        _log(f"analytic flops unavailable: {exc}")

    # difference method on ONE executable: n_iters-step call minus 1-step
    # call; identical dispatch overhead cancels
    t_long, t_short = [], []
    for i in range(4):
        t_long.append(timecall(n_iters))
        t_short.append(timecall(1))
        _log(f"pair {i}: long={t_long[-1]:.3f}s short={t_short[-1]:.3f}s")
    step_s = max(min(t_long) - min(t_short), 1e-9) / (n_iters - 1)

    peak, kind = chip_peak_flops()
    mfu_hlo = (flops / step_s / peak) if flops else None
    mfu_analytic = (flops_analytic / step_s / peak) if flops_analytic \
        else None
    print(json.dumps({
        "metric": "train_step_frames_per_s",
        "value": round(B * T / step_s, 1),
        "unit": "mel_frames/s",
        "steps_per_s": round(1.0 / step_s, 4),
        "step_s": round(step_s, 4),
        "batch": [B, N, T],
        "flops_per_step_hlo": flops,
        "flops_per_step_analytic": flops_analytic,
        "mfu_hlo": round(mfu_hlo, 4) if mfu_hlo else None,
        "mfu_analytic": round(mfu_analytic, 4) if mfu_analytic else None,
        "device": kind,
        "amp": bool(use_amp),
        "optim_state_dtype": str(state_dtype) if state_dtype else "float32",
        "raw_long_s": [round(x, 3) for x in t_long],
        "raw_short_s": [round(x, 3) for x in t_short],
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--amp", action="store_true",
                    help="bf16 activations outside the fp32 islands")
    ap.add_argument("-n", "--iters", type=int, default=10)
    ap.add_argument("--bf16-state", action="store_true",
                    help="bf16 RAdam moment trees (train_config."
                         "optim_state_dtype=bfloat16)")
    args = ap.parse_args()
    main(args.amp, args.iters,
         state_dtype="bfloat16" if args.bf16_state else None)
