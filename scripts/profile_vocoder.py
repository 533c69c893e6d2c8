#!/usr/bin/env python
"""Vocoder-stage attribution under the PRODUCTION dispatch (pallas narrow
MRFs, XLA C=256 stage, matmul-DFT denoiser): cumulative truncation cuts
timed with bench.py's scan-difference method (all repetitions inside one
jitted lax.scan with a runtime trip count; long-minus-short cancels
dispatch+sync weather). Marginal stage cost = difference between
successive cuts.

Cuts: pre | +st0(256) | +st1(128) | +st2(64) | +st3(32) | +post | +den

Optional variant sweep (PROF_VARIANTS=1): per-stage impl swaps
(xla / pallas / fold / wide / bf16 activations) timed as full-generator
programs for direct comparison.
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

from bench import HIFIGAN_V1  # noqa: E402
from radtts_tpu.models.hifigan import (LRELU_SLOPE,  # noqa: E402
                                       conv_transpose1d_apply,
                                       denoiser_apply, denoiser_init,
                                       hifigan_generator_init,
                                       _resblock1_apply)
from radtts_tpu.ops.conv import conv1d_apply  # noqa: E402

N_ITERS = 10
ROUNDS = 4
T_MEL = 608


def gen_prefix(params, mel, n_stages, with_post, impls=None,
               act_dtype=jnp.float32, ups=None):
    """Production-dispatch generator truncated after n_stages upsample
    stages. impls: optional per-stage MRF list from {"xla","pallas",
    "fold","pfold[bf16][@tile]","wide"}; ups: optional per-stage
    transpose-conv list from {"dilated","matmul"}."""
    meta = params["_meta"]
    rates, kernels = meta["upsample_rates"], meta["upsample_kernel_sizes"]
    rk, rd = meta["resblock_kernel_sizes"], meta["resblock_dilation_sizes"]
    from radtts_tpu.ops.folded_conv import conv_transpose1d_matmul
    from radtts_tpu.ops.pallas_mrf import (mrf_weights_from_params,
                                           pallas_mrf, pallas_mrf_folded,
                                           pallas_mrf_wide)

    x = conv1d_apply(params["conv_pre"], mel, padding=3)
    x = x.astype(act_dtype)
    for i in range(n_stages):
        u, k = rates[i], kernels[i]
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        tconv = (conv_transpose1d_matmul
                 if ups and ups[i] == "matmul" else conv_transpose1d_apply)
        x = tconv(params["ups"][i], x, u, (k - u) // 2).astype(act_dtype)
        C = x.shape[-1]
        impl = (impls[i] if impls else
                ("pallas" if C <= 128 else "xla"))
        if impl.startswith("pallas"):
            tile = (int(impl.split("@")[1]) if "@" in impl
                    else 1536 if C == 64 else 1024)
            wd = jnp.bfloat16 if "bf16" in impl else jnp.float32
            x = pallas_mrf(x.astype(jnp.float32), mrf_weights_from_params(
                params["resblocks"][i]), tile=tile,
                weight_dtype=wd).astype(act_dtype)
        elif impl == "wide":
            x = pallas_mrf_wide(
                x.astype(jnp.float32),
                mrf_weights_from_params(params["resblocks"][i])
            ).astype(act_dtype)
        elif impl.startswith("pfold"):
            F = 128 // C
            tile = int(impl.split("@")[1]) if "@" in impl else 512
            wd = jnp.bfloat16 if "bf16" in impl else jnp.float32
            x = pallas_mrf_folded(
                x.astype(jnp.float32),
                mrf_weights_from_params(params["resblocks"][i]),
                fold=F, tile=tile, weight_dtype=wd).astype(act_dtype)
        elif impl == "fold":
            from radtts_tpu.ops.folded_conv import (fold_time,
                                                    resblock1_apply_folded,
                                                    unfold_time)
            F = 128 // C
            X = fold_time(x, F)
            Xs = jnp.zeros_like(X)
            for j, block in enumerate(params["resblocks"][i]):
                Xs = Xs + resblock1_apply_folded(block, X, rk[j], rd[j], F,
                                                 lrelu_slope=LRELU_SLOPE)
            x = unfold_time(Xs / len(rk), F)
        else:
            xs = jnp.zeros_like(x)
            for j, block in enumerate(params["resblocks"][i]):
                xs = xs + _resblock1_apply(block, x, rk[j], rd[j])
            x = xs / len(rk)
    if with_post:
        x = jax.nn.leaky_relu(x.astype(jnp.float32))
        C, T = x.shape[-1], x.shape[1]
        if (C <= 64 and 128 % C == 0 and T % (128 // C) == 0
                and os.environ.get("RADTTS_POST_FOLD", "1") != "0"):
            # production folded post conv (models/hifigan.py round 5)
            from radtts_tpu.ops.conv import effective_weight
            from radtts_tpu.ops.folded_conv import (fold_conv_weights,
                                                    fold_time,
                                                    folded_conv_apply,
                                                    unfold_time)
            F = 128 // C
            pp = params["conv_post"]
            fw, fb, fpad = fold_conv_weights(
                effective_weight(pp), pp.get("b"), pad=3, dilation=1,
                fold=F)
            x = unfold_time(folded_conv_apply(fw, fb, fpad,
                                              fold_time(x, F)), F)
        else:
            x = conv1d_apply(params["conv_post"], x, padding=3)
        x = jnp.tanh(x)[..., 0]
    return x.astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    from contextlib import nullcontext
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu) if cpu is not None else nullcontext():
        voc = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
        den = denoiser_init(voc)
        mel0 = jnp.asarray(rng.standard_normal(
            (1, T_MEL, 80)).astype(np.float32))
        keys = jax.random.split(jax.random.PRNGKey(2), N_ITERS)
        chain0 = jnp.zeros((), jnp.float32)
        one, ten = jnp.int32(1), jnp.int32(N_ITERS)
    dev = jax.devices()[0]
    voc, den, mel0, keys, chain0, one, ten = jax.device_put(
        (voc, den, mel0, keys, chain0, one, ten), dev)
    print(f"# on {dev}", file=sys.stderr, flush=True)

    def scan_program(stage_fn):
        @jax.jit
        def run(n_active, chain, consts):
            def body(c, inp):
                i, key = inp
                return lax.cond(i < n_active,
                                lambda cc: stage_fn(consts, key, cc),
                                lambda cc: cc, c), ()
            return lax.scan(body, chain, (jnp.arange(N_ITERS), keys))[0]
        return run

    def make_cut(n_stages, with_post, with_den, impls=None,
                 act_dtype=jnp.float32, ups=None):
        def f(consts, key, chain):
            v, d, m = consts
            y = gen_prefix(v, m + chain * 1e-30, n_stages, with_post,
                           impls, act_dtype, ups=ups)
            if with_den:
                y = denoiser_apply(d, y, strength=0.01)
            return chain + jnp.sum(y.ravel()[:4]) * 1e-30
        return scan_program(f)

    prof_set = os.environ.get("PROF_SET", "cuts")
    if prof_set == "st1":
        # round-4 second pass: baseline = wide-256 + pfold@1024 on st3;
        # attack the C=128 stage (bf16 weights halve VMEM traffic, larger
        # tiles amortize the halo) and retune st3's tile.
        W = "wide"
        P3 = "pfold@1024"
        cuts = [
            ("base2", make_cut(4, True, True,
                               impls=[W, "pallas", "pallas", P3])),
            ("s1bf16", make_cut(4, True, True,
                                impls=[W, "pallasbf16", "pallas", P3])),
            # tile=2048 at C=128 OOMs scoped VMEM (19.6M vs 16M limit,
            # measured) — the 1792+ note in models/hifigan.py holds.
            ("s1bf16t15", make_cut(4, True, True,
                                   impls=[W, "pallasbf16@1536", "pallas",
                                          P3])),
            ("s3bf16", make_cut(4, True, True,
                                impls=[W, "pallas", "pallas",
                                       "pfoldbf16@1024"])),
            ("s2bf16", make_cut(4, True, True,
                                impls=[W, "pallas", "pallasbf16@1536",
                                       P3])),
        ]
    elif prof_set == "fold":
        # round-4 folded-kernel A/B: baseline = wide-256 default
        W = "wide"
        cuts = [
            ("base", make_cut(4, True, True,
                              impls=[W, "pallas", "pallas", "pallas"])),
            ("f32", make_cut(4, True, True,
                             impls=[W, "pallas", "pallas", "pfold"])),
            ("f32t1k", make_cut(4, True, True,
                                impls=[W, "pallas", "pallas",
                                       "pfold@1024"])),
            ("f64f32", make_cut(4, True, True,
                                impls=[W, "pallas", "pfold", "pfold"])),
            ("f64bf16", make_cut(4, True, True,
                                 impls=[W, "pallas", "pfoldbf16",
                                        "pfold"])),
            ("tmm", make_cut(4, True, True,
                             impls=[W, "pallas", "pallas", "pallas"],
                             ups=["matmul"] * 4)),
            ("tmm_f32", make_cut(4, True, True,
                                 impls=[W, "pallas", "pallas", "pfold"],
                                 ups=["matmul"] * 4)),
        ]
    else:
        # cumulative cuts under the PRODUCTION dispatch as of round 5
        # (models/hifigan.py hifigan_generator_apply defaults): wide-256,
        # pallas@1024 at C=128, pallas@1536 at C=64, pfold F=4 @1024 at
        # C=32
        PROD = ["wide", "pallas", "pallas", "pfold@1024"]
        cuts = [("pre", make_cut(0, False, False))]
        for n in range(1, 5):
            cuts.append((f"st{n - 1}", make_cut(n, False, False,
                                                impls=PROD[:n])))
        cuts.append(("post", make_cut(4, True, False, impls=PROD)))
        cuts.append(("den", make_cut(4, True, True, impls=PROD)))

    if os.environ.get("PROF_VARIANTS") == "1":
        cuts += [
            ("v_wide256", make_cut(4, True, True,
                                   impls=["wide", "pallas", "pallas",
                                          "pallas"])),
            ("v_fold", make_cut(4, True, True,
                                impls=["xla", "pallas", "fold", "fold"])),
            ("v_bf16", make_cut(4, True, True, act_dtype=jnp.bfloat16)),
            ("v_bf16wide", make_cut(4, True, True,
                                    impls=["wide", "pallas", "pallas",
                                           "pallas"],
                                    act_dtype=jnp.bfloat16)),
        ]

    consts = (voc, den, mel0)

    def timecall(run, n):
        tic = time.perf_counter()
        float(run(n, chain0, consts))
        return time.perf_counter() - tic

    for name, run in cuts:
        t = timecall(run, one)
        print(f"# {name} compile+first {t:.1f}s", file=sys.stderr,
              flush=True)

    t_long = {n: [] for n, _ in cuts}
    t_short = {n: [] for n, _ in cuts}
    for r in range(ROUNDS):
        for name, run in cuts:
            t_long[name].append(timecall(run, ten))
            t_short[name].append(timecall(run, one))
        line = " | ".join(
            f"{n} {(min(t_long[n]) - min(t_short[n])) / (N_ITERS - 1) * 1e3:.2f}"
            for n, _ in cuts)
        print(f"round {r}: {line}", flush=True)

    print()
    prev = 0.0
    for name, _ in cuts:
        per = (min(t_long[name]) - min(t_short[name])) / (N_ITERS - 1)
        marg = per - prev
        star = "" if name.startswith("v_") else f" (marginal {marg * 1e3:+.2f})"
        print(f"{name}: {per * 1e3:.2f} ms{star}", flush=True)
        if not name.startswith("v_"):
            prev = per


if __name__ == "__main__":
    main()
