#!/usr/bin/env python
"""Train-step time attribution on the live chip: where do the ~64 ms go?

bench_train.py measures the full step (fwd + bwd + RAdam) at MFU 0.444
(analytic). This script times ABLATED variants of the same step with the
identical scan+difference methodology (all reps inside one jitted scan,
runtime trip count, 1-rep run of the same executable subtracted), so the
marginals attribute the step time to components:

  full        fwd + bwd + optimizer, MAS binarization + KL on (the
              bench_train.py configuration)
  nobin       binarize=False: no MAS Viterbi scan, no KL loss
  fwdloss     loss_fn only (value, no grad, no optimizer)
  fwdloss_nb  loss_fn only, binarize=False
  fwd_dec     radtts_forward only (no losses at all), binarize=False
  noattr      full step on include_modules="decatn" (decoder+alignment
              only — drops DAP dur/f0/energy/vpred predictor fwd+bwd)

Differences of interest:
  full - nobin          = MAS + binarization-KL cost (fwd+bwd)
  full - fwdloss        = backward + optimizer cost
  fwdloss_nb - fwd_dec  = loss-layer cost (flow NLL + CTC + attr losses)
  full - noattr         = attribute-predictor cost (fwd+bwd, approx:
                          different param tree, same decoder shapes)

Usage: python scripts/profile_train.py [--amp] [--pairs 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from radtts_tpu.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache(
    default_path=os.path.join(_REPO, ".jax_cache"), cache_everything=True)

B, N, T = 16, 112, 512
N_ITERS = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amp", action="store_true")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--only", default="",
                    help="comma-separated variant subset")
    args = ap.parse_args()

    from contextlib import nullcontext

    from __graft_entry__ import (_LOSS_WEIGHTS, _example_batch,
                                 _flagship_model_config)
    from radtts_tpu.models.radtts import radtts_forward, radtts_init
    from radtts_tpu.ops import amp as _amp
    from radtts_tpu.train.optim import build_optimizer
    from radtts_tpu.train.trainer import (build_trainable_mask,
                                          make_train_step)

    mc = _flagship_model_config(small=False)
    mc_dec = dict(mc, include_modules="decatn")

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu) if cpu is not None else nullcontext():
        params = radtts_init(jax.random.PRNGKey(0), mc)
        params_dec = radtts_init(jax.random.PRNGKey(0), mc_dec)
        optimizer = build_optimizer("RAdam", 1e-4, 1e-6, 1.0)
        opt_state = optimizer.init(params)
        opt_state_dec = optimizer.init(params_dec)
        batch = _example_batch(0, B=B, N=N, T=T,
                               n_mel=mc["n_mel_channels"])
    dev = jax.devices()[0]
    (params, params_dec, opt_state, opt_state_dec, batch) = jax.device_put(
        (params, params_dec, opt_state, opt_state_dec, batch), dev)
    print(f"# on {dev}, amp={args.amp}", file=sys.stderr, flush=True)

    step_full = make_train_step(mc, _LOSS_WEIGHTS, 1.0, optimizer,
                                build_trainable_mask(params, "all", ()),
                                use_amp=args.amp)
    step_dec = make_train_step(mc_dec, _LOSS_WEIGHTS, 1.0, optimizer,
                               build_trainable_mask(params_dec, "all", ()),
                               use_amp=args.amp)

    # forward-only bodies reuse trainer loss structure via make_train_step's
    # loss closure? Not exposed — rebuild minimal ones here.
    from radtts_tpu.losses import radtts_loss

    def loss_value(p, batch, rng, binarize):
        with _amp.scope(args.amp):
            out = radtts_forward(
                p, batch["mel"], batch["speaker_ids"], batch["text"],
                batch["input_lengths"], batch["output_lengths"],
                binarize_attention_flag=binarize,
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

    def fwd_only(p, batch, rng):
        with _amp.scope(args.amp):
            out = radtts_forward(
                p, batch["mel"], batch["speaker_ids"], batch["text"],
                batch["input_lengths"], batch["output_lengths"],
                binarize_attention_flag=False,
                attn_prior=batch.get("attn_prior"), f0=batch.get("f0"),
                energy_avg=batch.get("energy_avg"),
                voiced_mask=batch.get("voiced_mask"),
                p_voiced=batch.get("p_voiced"), training=True,
                dropout_rng=rng)
        # anchor EVERY output leaf so DCE cannot drop any forward compute
        acc = 0.0
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                acc = acc + jnp.sum(leaf.astype(jnp.float32)) * 1e-12
        return acc

    keys = jax.random.split(jax.random.PRNGKey(1), N_ITERS)

    def scan_step(step, p, o, binarize, use_kl):
        """Full train-step scan (carries params/opt_state)."""
        @jax.jit
        def run(p, o, batch, n_active):
            def body(carry, inp):
                i, key = inp

                def active(c):
                    pp, oo = c
                    pp, oo, total, _, _ = step(pp, oo, batch, key,
                                               binarize, use_kl)
                    return (pp, oo), total

                return lax.cond(i < n_active, active,
                                lambda c: (c, jnp.float32(0)), carry)

            (p, o), totals = lax.scan(body, (p, o),
                                      (jnp.arange(N_ITERS), keys))
            return totals[0]

        return lambda n: float(run(p, o, batch, jnp.int32(n)))

    def scan_value(fn, p, *extra):
        """Forward-only scan (carries a scalar chain)."""
        @jax.jit
        def run(p, batch, n_active):
            def body(chain, inp):
                i, key = inp

                def active(c):
                    key2 = jax.random.fold_in(
                        key, (jnp.abs(c) * 1e-30).astype(jnp.int32))
                    return c + fn(p, batch, key2, *extra) * 1e-20

                return lax.cond(i < n_active, active, lambda c: c,
                                chain), ()

            return lax.scan(body, jnp.float32(0),
                            (jnp.arange(N_ITERS), keys))[0]

        return lambda n: float(run(p, batch, jnp.int32(n)))

    def fori_step(step, p, o, binarize, use_kl):
        """Same full train step, timed under lax.fori_loop instead of
        scan+cond: fori threads the (params, opt_state) carry without a
        branch, so comparing against scan_step isolates harness overhead
        (cond/select copies of the ~3-param-tree carry) from real step
        cost. n is still a runtime operand -> one executable for 10 and
        1 iterations."""
        @jax.jit
        def run(p, o, batch, n_active):
            def body(i, carry):
                pp, oo = carry
                pp, oo, total, _, _ = step(pp, oo, batch, keys[i],
                                           binarize, use_kl)
                return (pp, oo)

            p2, o2 = lax.fori_loop(0, n_active, body, (p, o))
            return p2["embedding"]["table"][0, 0]

        return lambda n: float(run(p, o, batch, jnp.int32(n)))

    def scan_sgd(p, binarize):
        """Full grads + a bare SGD write (no RAdam, no masks, no norm, no
        opt_state in the carry): full - scan_sgd isolates the optimizer
        machinery including its state traffic."""
        gfn = jax.value_and_grad(
            lambda pp, b, k: loss_value(pp, b, k, binarize), has_aux=False)

        @jax.jit
        def run(p, batch, n_active):
            def body(pp, inp):
                i, key = inp

                def active(c):
                    _, grads = gfn(c, batch, key)
                    return jax.tree.map(lambda a, g: a - 1e-12 * g, c,
                                        grads)

                return lax.cond(i < n_active, active, lambda c: c, pp), ()

            pp, _ = lax.scan(body, p, (jnp.arange(N_ITERS), keys))
            return pp["embedding"]["table"][0, 0]

        return lambda n: float(run(p, batch, jnp.int32(n)))

    def scan_grad(p, binarize, use_kl):
        """value_and_grad WITHOUT the optimizer: full - gradonly isolates
        RAdam + global_norm + mask/apply cost from the backward proper.
        Chains a scalar made from one grad leaf so steps serialize."""
        gfn = jax.value_and_grad(
            lambda pp, b, k: loss_value(pp, b, k, binarize), has_aux=False)

        @jax.jit
        def run(p, batch, n_active):
            def body(chain, inp):
                i, key = inp

                def active(c):
                    key2 = jax.random.fold_in(
                        key, (jnp.abs(c) * 1e-30).astype(jnp.int32))
                    total, grads = gfn(p, batch, key2)
                    # touch EVERY grad leaf: probing only one leaf lets
                    # XLA dead-code-eliminate the other weight-gradient
                    # matmuls (measured: 34 ms vs 46 ms with all leaves)
                    probe = sum(jnp.ravel(g)[0] for g in
                                jax.tree_util.tree_leaves(grads))
                    return c + (total + probe) * 1e-20

                return lax.cond(i < n_active, active, lambda c: c,
                                chain), ()

            return lax.scan(body, jnp.float32(0),
                            (jnp.arange(N_ITERS), keys))[0]

        return lambda n: float(run(p, batch, jnp.int32(n)))

    variants = [
        ("full", lambda: scan_step(step_full, params, opt_state,
                                   True, True)),
        ("gradonly", lambda: scan_grad(params, True, False)),
        ("fullfori", lambda: fori_step(step_full, params, opt_state,
                                       True, True)),
        ("sgd", lambda: scan_sgd(params, True)),
        ("nobin", lambda: scan_step(step_full, params, opt_state,
                                    False, False)),
        ("fwdloss", lambda: scan_value(
            lambda p, b, k: loss_value(p, b, k, True), params)),
        ("fwdloss_nb", lambda: scan_value(
            lambda p, b, k: loss_value(p, b, k, False), params)),
        ("fwd_dec", lambda: scan_value(fwd_only, params)),
        ("noattr", lambda: scan_step(step_dec, params_dec, opt_state_dec,
                                     True, True)),
    ]
    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]

    runners = {}
    for name, build in variants:
        tic = time.perf_counter()
        run = build()
        run(1)
        print(f"# {name} compile+first {time.perf_counter() - tic:.1f}s",
              file=sys.stderr, flush=True)
        runners[name] = run

    t_long = {n: [] for n, _ in variants}
    t_short = {n: [] for n, _ in variants}
    for r in range(args.pairs):
        for name, _ in variants:
            tic = time.perf_counter()
            runners[name](N_ITERS)
            t_long[name].append(time.perf_counter() - tic)
            tic = time.perf_counter()
            runners[name](1)
            t_short[name].append(time.perf_counter() - tic)
        line = " | ".join(
            f"{n} {(min(t_long[n]) - min(t_short[n])) / (N_ITERS - 1) * 1e3:.1f}"
            for n, _ in variants)
        print(f"round {r}: {line}", flush=True)

    per = {n: (min(t_long[n]) - min(t_short[n])) / (N_ITERS - 1)
           for n, _ in variants}
    print(json.dumps({k: round(v * 1e3, 2) for k, v in per.items()}))
    if "full" in per and "nobin" in per:
        print(f"# MAS+KL (fwd+bwd): {(per['full'] - per['nobin']) * 1e3:.2f} ms")
    if "full" in per and "fwdloss" in per:
        print(f"# bwd+optimizer:    {(per['full'] - per['fwdloss']) * 1e3:.2f} ms")
    if "fwdloss_nb" in per and "fwd_dec" in per:
        print(f"# loss layer (fwd): {(per['fwdloss_nb'] - per['fwd_dec']) * 1e3:.2f} ms")
    if "full" in per and "noattr" in per:
        print(f"# attr predictors (fwd+bwd): {(per['full'] - per['noattr']) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
