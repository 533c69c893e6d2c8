"""Multi-host child: one process of a jax.distributed CPU-backend training
run (reference launch contract: torch.distributed.launch --use_env,
reference train.py:488-491, distributed.py:48-64).

Env: MH_RANK, MH_WORLD, MH_PORT; JAX_PLATFORMS=cpu and XLA_FLAGS with the
per-process virtual device count are set by the spawning test. Prints a
JSON list of (loss, grad_norm) per step on rank 0."""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

RANK = int(os.environ["MH_RANK"])
WORLD = int(os.environ["MH_WORLD"])

if WORLD > 1:
    # all ranks share this host: pin Gloo to loopback (the default
    # interface pick is the first external NIC, which sandboxed hosts may
    # not route between local processes) — train.py does the same for a
    # localhost coordinator
    os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{os.environ['MH_PORT']}",
        num_processes=WORLD, process_id=RANK)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from __graft_entry__ import (_LOSS_WEIGHTS, _example_batch,  # noqa: E402
                             _flagship_model_config, radtts_init_with)
from radtts_tpu.train.optim import build_optimizer  # noqa: E402
from radtts_tpu.train.trainer import (build_trainable_mask,  # noqa: E402
                                      make_mesh, make_train_step,
                                      shard_batch)


def main():
    if WORLD > 1:
        # Establish the Gloo collectives context while both ranks are at
        # the same point: the context's key-value rendezvous has a 30 s
        # deadline, and on a loaded single-core host the ranks' first
        # train-step compiles can skew by more than that — the fast rank
        # then dies in GetKeyValue before the slow rank ever executes.
        # A trivial psum compiles in seconds on both ranks and the heavy
        # step later reuses the established context (same device clique).
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("gloo_context_warmup")

    cfg = _flagship_model_config(small=True)
    params = radtts_init_with(cfg)
    optimizer = build_optimizer("Adam", 1e-4, 0.0, 1.0)
    mask = build_trainable_mask(params, "all", ())
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, _LOSS_WEIGHTS, 1.0, optimizer, mask)
    mesh = make_mesh()

    B = 4
    batch_global = _example_batch(7, B=B, N=16, T=32,
                                  n_mel=cfg["n_mel_channels"])
    if WORLD > 1:
        # each process holds the rows its local devices own (global device
        # order groups by process; trainer.shard_batch assembles the global
        # array via make_array_from_process_local_data)
        per = B // WORLD
        local = {k: np.asarray(v)[RANK * per:(RANK + 1) * per]
                 for k, v in batch_global.items()}
    else:
        local = batch_global

    if WORLD > 1 and os.environ.get("MH_PAD_SKEW") == "1" and RANK == 1:
        # simulate per-rank collate divergence: this rank's local batch
        # sits in a LARGER text/frame bucket than rank 0's.
        # trainer.shard_batch must sync every rank to the global max
        # bucket before make_array_from_process_local_data, or the global
        # array assembly fails on mismatched local shapes.
        grow = {"text": ((0, 0), (0, 16)),
                "mel": ((0, 0), (0, 16), (0, 0)),
                "attn_prior": ((0, 0), (0, 16), (0, 16)),
                "f0": ((0, 0), (0, 16)),
                "voiced_mask": ((0, 0), (0, 16)),
                "energy_avg": ((0, 0), (0, 16))}
        local = {k: (np.pad(np.asarray(v), grow[k]) if k in grow else v)
                 for k, v in local.items()}

    # production mechanism (trainer.py uses the same wrapper): AOT-compile
    # each new signature on every rank, barrier, then execute — the step
    # program's Gloo rendezvous has a 30 s deadline, while first-call
    # compile times skew across ranks by minutes when one rank hits the
    # persistent compilation cache and another misses.
    from radtts_tpu.train.trainer import MultiHostStepRunner
    step = MultiHostStepRunner(step, "mh_child_step", n_static_tail=2)

    rng = jax.random.PRNGKey(0)
    results = []
    if os.environ.get("MH_CURRICULUM") == "1":
        # cross BOTH curriculum boundaries mid-run (trainer.py:499-500
        # schedule with binarization_start_iter=2, kl_loss_start_iter=4):
        # each flag flip is a NEW step signature, so the
        # MultiHostStepRunner must AOT-compile + barrier it on every rank
        # MID-RUN — the transition that works at iter 0 but can deadlock
        # the Gloo rendezvous at iter 6000 (reference: train.py:389-414)
        for it in range(6):
            binarize = it >= 2
            use_kl = binarize and it >= 4
            rng, sub = jax.random.split(rng)
            sharded = shard_batch(local, mesh)
            params, opt_state, total, loss_dict, gn = step(
                params, opt_state, sharded, sub, binarize, use_kl)
            results.append([float(total), float(gn),
                            float(loss_dict["binarization_loss"][0])])
        if RANK == 0:
            print("MH_RESULT " + json.dumps(
                {"steps": results, "aot_signatures": len(step.aot)}),
                flush=True)
        return
    for _ in range(2):
        rng, sub = jax.random.split(rng)
        sharded = shard_batch(local, mesh)
        params, opt_state, total, _, gn = step(params, opt_state, sharded,
                                               sub, True, False)
        results.append([float(total), float(gn)])
    if RANK == 0:
        print("MH_RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
