#!/usr/bin/env python
"""Per-component MXU roofline for the flagship train step's fwd+bwd
(VERDICT r04 item 5: the optimizer pass got a roofline defense, the
49.6 ms forward+backward did not).

Pure tracing — runs on CPU (JAX_PLATFORMS=cpu), no device time needed.
Walks the value_and_grad jaxpr (ops/flops.py mxu_records) and models
every dot/conv as MXU passes on a 128x128x128 systolic tile:

    passes = ceil(M/128) * ceil(N/128) * ceil(K/128) * batch
    time  >= passes * (2*128^3 / PEAK_BF16)

which charges small matmuls their real shape penalty: an LSTM step's
(B=16) x (K) @ (K) x (4H) dot fills 16 of 128 MXU rows, so its best
case is 12.5% of peak. Ops inside a lax.scan of length L execute as L
SEQUENTIALLY DEPENDENT dispatches (the recurrence), so their time is
L * per-iter time and cannot be amortized by batching with other work.

Output: per-group table (scan-serialized groups by (trips, M, N, K) +
the parallel pool), each with FLOPs, modeled floor, and share; totals
compared against the measured fwd+bwd wall time (profile_train.py).

Usage: JAX_PLATFORMS=cpu python scripts/roofline_train.py [--amp]
"""

import argparse
import math
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

B, N, T = 16, 112, 512
PEAK_BF16 = 197e12      # TPU v5e bf16 peak FLOP/s (MFU denominator used
                        # by bench_train.py: 5.57T / 0.0567s / 0.499)
HBM_BW = 819e9          # v5e HBM bytes/s
PASS_T = 2 * 128 ** 3 / PEAK_BF16   # seconds per full MXU pass


def mxu_floor(m, n, k, batch):
    passes = (math.ceil(m / 128) * math.ceil(n / 128)
              * math.ceil(k / 128) * batch)
    return passes * PASS_T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amp", action="store_true", default=True)
    ap.add_argument("--no-amp", dest="amp", action="store_false")
    ap.add_argument("--measured_ms", type=float, default=49.6,
                    help="measured fwd+bwd wall ms (profile_train.py "
                         "gradonly variant) to compare the floor against")
    args = ap.parse_args()

    from __graft_entry__ import (_LOSS_WEIGHTS, _example_batch,
                                 _flagship_model_config)
    from radtts_tpu.losses import radtts_loss
    from radtts_tpu.models.radtts import radtts_forward, radtts_init
    from radtts_tpu.ops import amp as _amp
    from radtts_tpu.ops.flops import mxu_records

    mc = _flagship_model_config(small=False)
    params = radtts_init(jax.random.PRNGKey(0), mc)
    batch = _example_batch(0, B=B, N=N, T=T, n_mel=mc["n_mel_channels"])

    def loss_value(p, batch, rng):
        with _amp.scope(args.amp):
            out = radtts_forward(
                p, batch["mel"], batch["speaker_ids"], batch["text"],
                batch["input_lengths"], batch["output_lengths"],
                binarize_attention_flag=True,
                attn_prior=batch.get("attn_prior"), f0=batch.get("f0"),
                energy_avg=batch.get("energy_avg"),
                voiced_mask=batch.get("voiced_mask"),
                p_voiced=batch.get("p_voiced"), training=True,
                dropout_rng=rng)
        loss_dict = radtts_loss(
            out, batch["input_lengths"], batch["output_lengths"],
            sigma=1.0, n_group_size=mc["n_group_size"],
            dur_model_config=mc.get("dur_model_config"),
            f0_model_config=mc.get("f0_model_config"),
            energy_model_config=mc.get("energy_model_config"),
            vpred_model_config=mc.get("v_model_config"),
            loss_weights=_LOSS_WEIGHTS)
        total = 0.0
        for v, w in loss_dict.values():
            if w > 0:
                total = total + v * w
        return total

    gfn = jax.value_and_grad(loss_value)
    print(f"# tracing value_and_grad (amp={args.amp}) ...",
          file=sys.stderr, flush=True)
    recs = mxu_records(gfn, params, batch, jax.random.PRNGKey(1))

    groups = defaultdict(lambda: dict(flops=0.0, mxu=0.0, hbm=0.0,
                                      floor=0.0, count=0))
    for r in recs:
        serial = r["trips"] > 1
        if serial:
            key = ("scan", r["trips"], r["kind"], r["m"], r["n"], r["k"])
        else:
            key = ("par", 1, r["kind"], None, None, None)
        g = groups[key]
        t_mxu = mxu_floor(r["m"], r["n"], r["k"], r["batch"])
        t_hbm = r["bytes"] / HBM_BW
        g["flops"] += r["flops"] * r["trips"]
        g["mxu"] += r["trips"] * t_mxu
        g["hbm"] += r["trips"] * t_hbm
        # per-op roofline: an op pays the larger of its compute time and
        # its boundary-tensor traffic time (post-fusion floor)
        g["floor"] += r["trips"] * max(t_mxu, t_hbm)
        g["count"] += 1

    total_flops = sum(g["flops"] for g in groups.values())
    total_floor = sum(g["floor"] for g in groups.values())
    total_mxu = sum(g["mxu"] for g in groups.values())
    total_hbm = sum(g["hbm"] for g in groups.values())
    serial_floor = sum(g["floor"] for k, g in groups.items()
                       if k[0] == "scan")

    print(f"total analytic matmul/conv FLOPs: {total_flops / 1e12:.3f} T")
    print(f"roofline floor sum(max(mxu, hbm)): {total_floor * 1e3:.2f} ms"
          f"   [pure-MXU {total_mxu * 1e3:.2f} ms, pure-HBM "
          f"{total_hbm * 1e3:.2f} ms]")
    print(f"  of which scan-serialized: {serial_floor * 1e3:.2f} ms")
    print(f"measured fwd+bwd: {args.measured_ms:.1f} ms -> modeled floor "
          f"is {total_floor * 1e3 / args.measured_ms * 100:.0f}% of it "
          f"(ratio {args.measured_ms / (total_floor * 1e3):.2f}x)")
    print()
    print(f"{'group':>44} | {'count':>5} | {'GFLOPs':>8} | {'mxu ms':>7} |"
          f" {'hbm ms':>7} | {'floor ms':>8} | {'share':>6}")
    for key, g in sorted(groups.items(), key=lambda kv: -kv[1]["floor"]):
        kind, trips, op, m, n, k = key
        if kind == "scan":
            label = f"scan L={trips} {op} {m}x{k} @ {k}x{n}"
        else:
            label = f"parallel pool ({op})"
        print(f"{label:>44} | {g['count']:>5} | "
              f"{g['flops'] / 1e9:>8.1f} | {g['mxu'] * 1e3:>7.2f} | "
              f"{g['hbm'] * 1e3:>7.2f} | {g['floor'] * 1e3:>8.2f} | "
              f"{g['floor'] / total_floor * 100:>5.1f}%")
    # param-traffic sanity: one full read of the params per fwd and per
    # bwd is the HBM floor for weight traffic alone
    n_params = sum(x.size for x in jax.tree.leaves(params)
                   if hasattr(x, "size"))
    wbytes = n_params * 4
    print()
    print(f"# params {n_params / 1e6:.0f} M -> one fp32 read = "
          f"{wbytes / 1e9:.2f} GB = {wbytes / HBM_BW * 1e3:.2f} ms HBM; "
          f"fwd+bwd touch weights >=2x (+ grads write) -> "
          f">={3 * wbytes / HBM_BW * 1e3:.2f} ms weight traffic floor")


if __name__ == "__main__":
    main()
