#!/usr/bin/env python
"""Dataset preflight / cache warm CLI (same public surface as the reference
data.py:501-534 __main__): iterates the full train+val datasets, validating
filelists/audio and pre-populating the beta-binomial-prior and pyin-F0
caches."""

import argparse
import json

from radtts_tpu.config import update_params
from radtts_tpu.data.dataset import Data, DataCollate

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

    for dataset in (trainset, valset):
        for i in range(len(dataset)):
            dataset[i]
            print("{}/{}".format(i, len(dataset)))
