#!/usr/bin/env python
"""Training CLI (same public surface as the reference train.py:458-498:
`python train.py -c config.json -p key=value ...`).

Data parallelism runs over all visible TPU devices via a jax.sharding Mesh;
no RANK/WORLD_SIZE launcher is needed (single process drives all local
chips). RANK/WORLD_SIZE env vars are still honored for multi-host dataset
sharding.
"""

import argparse
import json
import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    # some TPU plugins ignore the env var; enforce it via config
    # (without this, JAX_PLATFORMS=cpu still initializes the TPU backend —
    # which HANGS rather than errors when the device tunnel is down)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from radtts_tpu.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from radtts_tpu.config import update_params
from radtts_tpu.train.trainer import train

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', type=str,
                        help='JSON file for configuration')
    parser.add_argument('-p', '--params', nargs='+', default=[])
    args = parser.parse_args()

    with open(args.config) as f:
        config = json.load(f)
    update_params(config, args.params)
    print(config)

    train_config = config["train_config"]

    if ('n_aug_dims' in config["model_config"]
            and 'aug_probabilities' in config["data_config"]):
        assert (config["model_config"]['n_aug_dims']
                >= len(config["data_config"]['aug_probabilities']))

    rank = int(os.getenv('RANK', '0'))
    world = int(os.getenv('WORLD_SIZE', '1'))
    print(f'> got rank {rank} and world size {world} ...')

    if world > 1:
        # multi-host launch contract mirrors the reference's
        # torch.distributed.launch --use_env (reference: train.py:488-491,
        # distributed.py:48-64): RANK/WORLD_SIZE + MASTER_ADDR/MASTER_PORT
        # env vars; the JAX runtime replaces the NCCL TCP rendezvous.
        import jax
        coordinator = (os.getenv('MASTER_ADDR', '127.0.0.1') + ':'
                       + os.getenv('MASTER_PORT', '12355'))
        if coordinator.rsplit(':', 1)[0] in ('127.0.0.1', 'localhost'):
            # all ranks are on this host (dev/test runs): pin the CPU
            # backend's Gloo collectives to loopback — default interface
            # selection picks the first external NIC, which sandboxed or
            # firewalled hosts may not route between local processes
            os.environ.setdefault('GLOO_SOCKET_IFNAME', 'lo')
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=world, process_id=rank)
        # startup barrier: establishes the collectives context (Gloo on
        # CPU) while every rank is at the same point — its key-value
        # rendezvous has a short deadline, and first-step compile skew
        # across ranks can exceed it — and fails fast with a clear error
        # if a rank never joined
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("startup")

    train(config, **train_config)
