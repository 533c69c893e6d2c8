#!/usr/bin/env python
"""Dataset preflight / cache warm CLI (same public surface as the reference
data.py:501-534 __main__): iterates the full train+val datasets, validating
filelists/audio and pre-populating the beta-binomial-prior and pyin-F0
caches.

Cache warming is numpy-bound (pyin), so with -j > 1 samples fan out over a
process pool — the analogue of the reference's 8 DataLoader worker
processes (reference: train.py:151-154); caches are keyed per sample, so
parallel warming is safe."""

import argparse
import json
import os

from radtts_tpu.config import update_params
from radtts_tpu.data.dataset import Data, DataCollate

_DATASET = None


def _init_worker(data_config, files_key, speaker_ids):
    """Each worker builds its own Data (LMDB handles/file objects do not
    survive fork+pickle)."""
    global _DATASET
    ignore_keys = ['training_files', 'validation_files']
    _DATASET = Data(data_config[files_key],
                    **{k: v for k, v in data_config.items()
                       if k not in ignore_keys},
                    speaker_ids=speaker_ids)


def _warm(i):
    _DATASET[i]
    return i


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', type=str,
                        help='JSON file for configuration')
    parser.add_argument('-p', '--params', nargs='+', default=[])
    parser.add_argument('-j', '--jobs', type=int,
                        default=min(8, os.cpu_count() or 1),
                        help='worker processes for cache warming')
    args = parser.parse_args()

    with open(args.config) as f:
        config = json.load(f)
    update_params(config, args.params)
    print(config)

    data_config = config["data_config"]
    ignore_keys = ['training_files', 'validation_files']
    trainset = Data(data_config['training_files'],
                    **{k: v for k, v in data_config.items()
                       if k not in ignore_keys})
    valset = Data(data_config['validation_files'],
                  **{k: v for k, v in data_config.items()
                     if k not in ignore_keys},
                  speaker_ids=trainset.speaker_ids)
    collate_fn = DataCollate()

    for dataset, files_key in ((trainset, 'training_files'),
                               (valset, 'validation_files')):
        n = len(dataset)
        if args.jobs <= 1 or n < 2:
            for i in range(n):
                dataset[i]
                print("{}/{}".format(i, n))
            continue
        import multiprocessing as mp
        ctx = mp.get_context("spawn")
        with ctx.Pool(min(args.jobs, n), _init_worker,
                      (data_config, files_key,
                       trainset.speaker_ids)) as pool:
            for i in pool.imap_unordered(_warm, range(n), chunksize=4):
                print("{}/{}".format(i, n))
