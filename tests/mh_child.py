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

    rng = jax.random.PRNGKey(0)
    results = []
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
