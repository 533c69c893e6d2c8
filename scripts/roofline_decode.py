#!/usr/bin/env python
"""Per-component MXU/HBM roofline for the decode stage (the 3.26 ms of
the 9.1 ms serving pipeline that is neither durations nor vocoder).

Completes the roofline trilogy (roofline_train.py for fwd+bwd,
roofline_vocoder.py for the HiFi-GAN stages): walks the jaxpr of the
EXACT production decode program — `radtts_infer` at B=1 with folded
norms and precomputed 1x1 inverses, the same shapes bench.py's
`s_decode` stage times (N=64 tokens, 608-frame budget) — and charges
every dot/conv `max(MXU passes, boundary-tensor HBM)` on a 128^3
systolic-tile model (ops/flops.py `mxu_records`).

Two caveats the train roofline shares, which matter MORE at B=1:
  - scan groups charge loop-invariant weights per trip on the HBM side;
    XLA actually keeps them VMEM-resident across iterations (they fit),
    so for the recurrences the MXU column is the believable floor and
    the `floor` column is an overestimate. Both are printed.
  - an M=1 row fills 1/128 of the systolic array but still pays a full
    pass: the model charges B=1 matmuls their real shape penalty.

Compare against `scripts/profile_decode.py`'s measured sub-blocks
(encoder / DAPs / context LSTM / 8-flow inverse chain) to see which
components sit on their floor and which have headroom.

Usage: JAX_PLATFORMS=cpu python scripts/roofline_decode.py
"""

import argparse
import math
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_TOKENS = 64       # matches profile_decode.py
MAX_FRAMES = 608    # matches profile_decode.py / bench.py frame budget
PEAK_BF16 = 197e12  # TPU v5e bf16 peak FLOP/s
HBM_BW = 819e9      # v5e HBM bytes/s
PASS_T = 2 * 128 ** 3 / PEAK_BF16


def mxu_floor(m, n, k, batch):
    passes = (math.ceil(m / 128) * math.ceil(n / 128)
              * math.ceil(k / 128) * batch)
    return passes * PASS_T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured_ms", type=float, default=3.26,
                    help="measured decode stage wall ms (bench.py "
                         ".bench_last.json stage_ms.decode)")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_model_config
    from radtts_tpu.models.radtts import radtts_infer, radtts_init
    from radtts_tpu.ops.fold_norms import fold_norms
    from radtts_tpu.ops.flops import mxu_records
    from radtts_tpu.ops.invertible import precompute_inverses

    mc = _flagship_model_config(small=False)
    print("# tracing decode (folded norms, B=1, "
          f"N={N_TOKENS}, frames={MAX_FRAMES}) ...",
          file=sys.stderr, flush=True)
    params = fold_norms(precompute_inverses(
        radtts_init(jax.random.PRNGKey(0), mc)))

    spk = jnp.zeros((1,), jnp.int32)
    txt = jnp.zeros((1, N_TOKENS), jnp.int32)
    dur = jnp.full((1, N_TOKENS), MAX_FRAMES // N_TOKENS, jnp.int32)

    def decode(p, key):
        return radtts_infer(p, key, spk, txt, 0.8, MAX_FRAMES, dur=dur,
                            sigma_f0=1.0, sigma_energy=1.0)["mel"]

    recs = mxu_records(decode, params, jax.random.PRNGKey(1))

    groups = defaultdict(lambda: dict(flops=0.0, mxu=0.0, hbm=0.0,
                                      floor=0.0, count=0))
    for r in recs:
        if r["trips"] > 1:
            key = ("scan", r["trips"], r["kind"], r["m"], r["n"], r["k"])
        else:
            # decode has few distinct parallel shapes; keep them apart so
            # the WN flow convs (N-wide, K=5*1024 taps) are attributable
            key = ("par", 1, r["kind"], r["m"], r["n"], r["k"])
        g = groups[key]
        t_mxu = mxu_floor(r["m"], r["n"], r["k"], r["batch"])
        t_hbm = r["bytes"] / HBM_BW
        g["flops"] += r["flops"] * r["trips"]
        g["mxu"] += r["trips"] * t_mxu
        g["hbm"] += r["trips"] * t_hbm
        g["floor"] += r["trips"] * max(t_mxu, t_hbm)
        g["count"] += 1

    total_flops = sum(g["flops"] for g in groups.values())
    total_floor = sum(g["floor"] for g in groups.values())
    total_mxu = sum(g["mxu"] for g in groups.values())
    total_hbm = sum(g["hbm"] for g in groups.values())
    serial_mxu = sum(g["mxu"] for k, g in groups.items() if k[0] == "scan")
    par_floor = sum(g["floor"] for k, g in groups.items() if k[0] == "par")

    print(f"total analytic matmul/conv FLOPs: {total_flops / 1e9:.1f} G")
    print(f"roofline floor sum(max(mxu, hbm)): {total_floor * 1e3:.2f} ms"
          f"   [pure-MXU {total_mxu * 1e3:.2f} ms, pure-HBM "
          f"{total_hbm * 1e3:.2f} ms]")
    print(f"  parallel-pool floor: {par_floor * 1e3:.2f} ms; "
          f"scan-serialized MXU floor (weights VMEM-resident): "
          f"{serial_mxu * 1e3:.2f} ms")
    believable = par_floor + serial_mxu
    print(f"  believable floor (parallel max(mxu,hbm) + scan MXU): "
          f"{believable * 1e3:.2f} ms")
    print(f"measured decode: {args.measured_ms:.2f} ms -> "
          f"{args.measured_ms / (believable * 1e3):.2f}x believable floor")
    print()
    print(f"{'group':>44} | {'count':>5} | {'GFLOPs':>8} | {'mxu ms':>7} |"
          f" {'hbm ms':>7} | {'floor ms':>8} | {'share':>6}")
    for key, g in sorted(groups.items(), key=lambda kv: -kv[1]["floor"]):
        kind, trips, op, m, n, k = key
        if kind == "scan":
            label = f"scan L={trips} {op} {m}x{k} @ {k}x{n}"
        else:
            label = f"par {op} {m}x{k} @ {k}x{n}"
        print(f"{label:>44} | {g['count']:>5} | "
              f"{g['flops'] / 1e9:>8.1f} | {g['mxu'] * 1e3:>7.2f} | "
              f"{g['hbm'] * 1e3:>7.2f} | {g['floor'] * 1e3:>8.2f} | "
              f"{g['floor'] / total_floor * 100:>5.1f}%")


if __name__ == "__main__":
    main()
