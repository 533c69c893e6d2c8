#!/usr/bin/env python
"""Build the /verify fixtures: reduced reference torch ckpt, small HiFi-GAN
ckpt+config, tiny int16-wav dataset + filelist + repointed config.

Usage: python scripts/build_verify_fixtures.py [/tmp/vfx]
"""

import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np
import torch

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vfx"


def main():
    os.makedirs(OUT, exist_ok=True)
    from ref_utils import install_reference, converge_spectral_norms
    install_reference()
    import radtts as ref_radtts
    import hifigan_models
    from hifigan_env import AttrDict

    with open("configs/config_ljs_dap.json") as f:
        cfg = json.load(f)
    mc = dict(cfg["model_config"],
              n_text_dim=64, n_hidden=32, n_flows=4, mel_encoder_n_hidden=64)
    for key in ("dur_model_config", "f0_model_config",
                "energy_model_config", "v_model_config"):
        sub = json.loads(json.dumps(mc[key]))
        sub["hparams"]["bottleneck_hparams"]["in_dim"] = 64
        if "arch_hparams" in sub["hparams"]:
            sub["hparams"]["arch_hparams"]["n_channels"] = 32
        mc[key] = sub

    torch.manual_seed(0)
    model = ref_radtts.RADTTS(**mc)
    converge_spectral_norms(model)
    torch.save({"state_dict": model.state_dict(), "iteration": 0},
               f"{OUT}/radtts_ckpt.pt")

    H_SMALL = {
        "resblock": "1", "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 64,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "gaussian_blur": {"p_blurring": 0.0},
        "sampling_rate": 22050, "num_mels": 80,
    }
    torch.manual_seed(1)
    gen = hifigan_models.Generator(AttrDict(H_SMALL))
    torch.save({"generator": gen.state_dict()}, f"{OUT}/hifigan.pt")
    with open(f"{OUT}/hifigan_config.json", "w") as f:
        json.dump(H_SMALL, f)

    # tiny dataset: 3 short int16 wavs with pitch so pyin finds voicing
    from scipy.io import wavfile
    os.makedirs(f"{OUT}/wavs", exist_ok=True)
    sr = 22050
    rng = np.random.default_rng(0)
    texts = ["the cat sat on the mat.",
             "deep voices carry farther.",
             "speech synthesis is fun."]
    rows = []
    for i, txt in enumerate(texts):
        t = np.arange(int(sr * 1.4), dtype=np.float32) / sr
        f0 = 140 + 40 * i + 20 * np.sin(2 * np.pi * 2.0 * t)
        sig = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / sr)
        sig += 0.05 * rng.standard_normal(len(t)).astype(np.float32)
        wavfile.write(f"{OUT}/wavs/utt{i}.wav", sr,
                      (sig * 32767 * 0.6).astype(np.int16))
        rows.append(f"utt{i}.wav|{txt}|ljs")
    with open(f"{OUT}/filelist_train.txt", "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(f"{OUT}/filelist_val.txt", "w") as f:
        f.write(rows[0] + "\n")

    dc = cfg["data_config"]
    dc["training_files"] = {"fx": {
        "basedir": f"{OUT}/", "audiodir": "wavs", "sampling_rate": sr,
        "filelist": f"{OUT}/filelist_train.txt", "lmdbpath": ""}}
    dc["validation_files"] = {"fx": {
        "basedir": f"{OUT}/", "audiodir": "wavs", "sampling_rate": sr,
        "filelist": f"{OUT}/filelist_val.txt", "lmdbpath": ""}}
    dc["betabinom_cache_path"] = f"{OUT}/cache/"
    dc["dur_min"] = 0.1
    dc["dur_max"] = 5.0
    cfg["model_config"] = mc
    cfg["train_config"]["output_directory"] = f"{OUT}/train_out"
    with open(f"{OUT}/config.json", "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"fixtures in {OUT}")


if __name__ == "__main__":
    main()
