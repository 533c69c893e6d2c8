#!/usr/bin/env python
"""HiFi-GAN vocoder fine-tuning CLI.

The reference ships the full discriminator suite and GAN losses but no
vocoder training loop (reference: hifigan_models.py:228-384); this CLI
provides one with the upstream HiFi-GAN recipe. It reads the same radtts
config for the filelists/audio parameters and the same hifigan config
JSON the inference CLIs consume, and checkpoints in the torch-compatible
`{'generator': state_dict}` format that load_vocoder / the reference load.

    python train_vocoder.py -c configs/config_ljs_dap.json \
        -k hifigan_config.json -o outdir [--warmstart hifigan.pt] \
        [--steps 10000 --batch_size 16 --segment_size 8192]
"""

import argparse
import json
import os
import time

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    # some TPU plugins ignore the env var; enforce it via config
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from radtts_tpu.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax.numpy as jnp

from radtts_tpu.config import update_params


def filelist_audio_paths(data_config, which="training_files"):
    paths = []
    for _, spec in data_config[which].items():
        basedir = spec["basedir"]
        audiodir = spec.get("audiodir", "")
        with open(os.path.join(basedir, spec["filelist"]),
                  encoding="utf-8") as f:
            for line in f:
                name = line.rstrip("\n").split("|")[0]
                paths.append(os.path.join(basedir, audiodir, name))
    return paths


def main(args, config):
    from radtts_tpu.models.hifigan import (AttrDict,
                                           hifigan_generator_from_torch,
                                           hifigan_generator_to_torch)
    from radtts_tpu.train.vocoder_trainer import (SegmentSampler,
                                                  make_optimizers,
                                                  make_vocoder_train_step,
                                                  vocoder_train_init)

    data_config = config["data_config"]
    with open(args.vocoder_config) as f:
        h = json.load(f)

    mel_kwargs = dict(
        filter_length=data_config["filter_length"],
        hop_length=data_config["hop_length"],
        win_length=data_config["win_length"],
        n_mel_channels=data_config["n_mel_channels"],
        sampling_rate=data_config["sampling_rate"],
        mel_fmin=data_config["mel_fmin"],
        mel_fmax=data_config["mel_fmax"])

    key = jax.random.PRNGKey(args.seed)
    params = vocoder_train_init(key, h)
    if args.warmstart:
        import torch
        ckpt = torch.load(args.warmstart, map_location="cpu",
                          weights_only=False)
        params["gen"] = hifigan_generator_from_torch(
            ckpt["generator"], h)
        print(f"warmstarted generator from '{args.warmstart}'")

    optim_g, optim_d = make_optimizers(lr=args.lr,
                                       lr_decay=args.lr_decay,
                                       decay_every=args.decay_every)
    opt_g = optim_g.init(params["gen"])
    opt_d = optim_d.init({"mpd": params["mpd"], "msd": params["msd"]})

    start_it = 0
    if args.resume:
        # full-state resume: generator + discriminators + both optimizer
        # states (a generator-only restart would re-initialize MPD/MSD
        # against a trained generator and destabilize the GAN)
        from radtts_tpu.train.checkpoint import load_checkpoint
        params, opts, meta = load_checkpoint(
            args.resume, params, {"g": opt_g, "d": opt_d})
        if opts is not None:
            opt_g, opt_d = opts["g"], opts["d"]
        start_it = int(meta["iteration"])
        print(f"resumed full GAN state from '{args.resume}' "
              f"(iteration {start_it})")

    p_blur = float(h.get("gaussian_blur", {}).get("p_blurring", 0.0))
    step = make_vocoder_train_step(mel_kwargs, optim_g, optim_d,
                                   p_blurring=p_blur)

    paths = filelist_audio_paths(data_config)
    sampler = SegmentSampler(paths, args.segment_size, seed=args.seed)
    os.makedirs(args.output_dir, exist_ok=True)

    base_rng = jax.random.PRNGKey(args.seed + 1)
    tic = time.time()
    for it in range(start_it, args.steps):
        # rng and segment choice both keyed by the ITERATION, so a
        # --resume run continues the exact stream of the uninterrupted one
        audio = jnp.asarray(sampler.sample(args.batch_size, step=it))
        sub = jax.random.fold_in(base_rng, it)
        params, opt_g, opt_d, metrics = step(params, opt_g, opt_d, audio,
                                             sub)
        if it % args.log_interval == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"iter {it} ({time.time() - tic:.1f}s) " +
                  "  ".join(f"{k}: {v:.4f}" for k, v in sorted(m.items())),
                  flush=True)
            tic = time.time()
        if (it + 1) % args.steps_per_checkpoint == 0 or \
                it + 1 == args.steps:
            import torch
            out = os.path.join(args.output_dir, f"g_{it + 1:08d}.pt")
            torch.save({"generator": hifigan_generator_to_torch(
                params["gen"])}, out)
            # companion full-state checkpoint (upstream HiFi-GAN's do_*):
            # discriminators + both optimizer states, for --resume
            from radtts_tpu.train.checkpoint import save_checkpoint
            do_path = os.path.join(args.output_dir, f"do_{it + 1:08d}")
            save_checkpoint(do_path, params, {"g": opt_g, "d": opt_d},
                            iteration=it + 1)
            print(f"saved {out} + {do_path}.npz", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", type=str, required=True,
                    help="radtts JSON config (data_config: filelists/stft)")
    ap.add_argument("-k", "--vocoder_config", type=str, required=True)
    ap.add_argument("-p", "--params", nargs="+", default=[])
    ap.add_argument("-o", "--output_dir", type=str, required=True)
    ap.add_argument("--warmstart", type=str, default="",
                    help="torch {'generator': sd} checkpoint to start from")
    ap.add_argument("--resume", type=str, default="",
                    help="do_* full-state checkpoint (gen+discs+optims) "
                         "saved by this CLI")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--segment_size", type=int, default=8192)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--lr_decay", type=float, default=0.999)
    ap.add_argument("--decay_every", type=int, default=1000)
    ap.add_argument("--steps_per_checkpoint", type=int, default=2500)
    ap.add_argument("--log_interval", type=int, default=10)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    with open(args.config) as f:
        config = json.load(f)
    update_params(config, args.params)
    main(args, config)
