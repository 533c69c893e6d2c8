#!/usr/bin/env python
"""Training-step benchmark: steps/s, mel frames/s, and an MFU estimate on
one chip (reference trains with AMP, train.py:364,416-422; it publishes no
throughput numbers — BASELINE.md).

Runs the jitted full train step (forward + backward + RAdam update, MAS
binarization + CTC on) on the flagship config_ljs_dap model at B=16 and
LJS-typical sequence lengths. Steps serialize naturally (params/opt_state
chain through the loop), so a single host sync at the end times the whole
sequence — robust on tunneled backends where block_until_ready can return
early (docs/DESIGN.md §8).

MFU = (HLO flops per step from XLA cost analysis) / (step_time * chip peak).
Peak table uses bf16 MXU peak per chip generation; fp32 params run the MXU
in bf16 passes at DEFAULT matmul precision, and the bf16 AMP mode feeds it
bf16 activations outright.

Prints ONE JSON line:
  {"metric": "train_step_frames_per_s", "value": ..., "unit": "mel_frames/s",
   "steps_per_s": ..., "mfu": ..., "flops_per_step": ..., "amp": ...}
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

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


def chip_peak_flops():
    kind = jax.devices()[0].device_kind
    for key, peak in PEAK_FLOPS.items():
        if kind.lower().startswith(key.lower()):
            return peak, kind
    return 197e12, kind  # assume v5e-class if unknown


def main(use_amp, n_iters):
    n_iters = max(2, n_iters)  # difference method needs two trip counts
    from __graft_entry__ import (_LOSS_WEIGHTS, _example_batch,
                                 _flagship_model_config)
    from radtts_tpu.models.radtts import radtts_init
    from radtts_tpu.train.optim import build_optimizer
    from radtts_tpu.train.trainer import (build_trainable_mask,
                                          make_train_step)

    model_config = _flagship_model_config(small=False)
    params = radtts_init(jax.random.PRNGKey(0), model_config)
    optimizer = build_optimizer("RAdam", 1e-4, 1e-6, 1.0)
    mask = build_trainable_mask(params, "all", ())
    opt_state = optimizer.init(params)
    batch = _example_batch(0, B=B, N=N, T=T,
                           n_mel=model_config["n_mel_channels"])

    step = make_train_step(model_config, _LOSS_WEIGHTS, 1.0, optimizer,
                           mask, use_amp=use_amp)
    rng = jax.random.PRNGKey(1)
    keys = jax.random.split(rng, n_iters)

    # All timed steps run INSIDE one jitted lax.scan (single dispatch);
    # params/opt_state chain through the carry so steps serialize
    # on-device. See docs/DESIGN.md §8: per-dispatch overhead through the
    # tunnel ranges 0.7 ms to >1 s with tenant load.
    @jax.jit
    def run_steps(params, opt_state, batch, kk):
        def body(carry, key):
            params, opt_state = carry
            params, opt_state, total, _, _ = step(params, opt_state, batch,
                                                  key, True, True)
            return (params, opt_state), total
        (params, opt_state), totals = jax.lax.scan(
            body, (params, opt_state), kk)
        return params, opt_state, totals[-1]

    # compile + warmup both trip counts; sync via scalar host transfer
    _, _, total = run_steps(params, opt_state, batch, keys)
    float(total)
    float(run_steps(params, opt_state, batch, keys[:1])[2])

    # flops per step, two ways (they differ; report both honestly):
    # - HLO: XLA cost analysis over the OPTIMIZED program — counts unrolled
    #   /rematerialized ops and elementwise work, and grades fp32 ops
    #   against the bf16 peak, so the derived MFU flatters the program;
    # - analytic: dot/conv FLOPs from the traced jaxpr (fwd + AD backward),
    #   the conventional "model FLOPs" MFU numerator.
    flops = None
    try:
        cost = step.lower(params, opt_state, batch, keys[-1], True,
                          True).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as exc:  # cost analysis is best-effort per backend
        print(f"# cost_analysis unavailable: {exc}")
    try:
        from radtts_tpu.ops.flops import count_matmul_flops
        flops_analytic = count_matmul_flops(
            lambda p, o, b, k: step(p, o, b, k, True, True),
            params, opt_state, batch, keys[-1])
    except Exception as exc:
        print(f"# analytic flops unavailable: {exc}")
        flops_analytic = None

    # difference method: n_iters-step scan minus 1-step scan of the same
    # program cancels the (weather-dependent) dispatch+sync overhead
    def timecall(kk):
        tic = time.perf_counter()
        float(run_steps(params, opt_state, batch, kk)[2])
        return time.perf_counter() - tic

    t_long, t_short = [], []
    for _ in range(4):
        t_long.append(timecall(keys))
        t_short.append(timecall(keys[:1]))
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
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--amp", action="store_true",
                    help="bf16 activations outside the fp32 islands")
    ap.add_argument("-n", "--iters", type=int, default=10)
    args = ap.parse_args()
    main(args.amp, args.iters)
