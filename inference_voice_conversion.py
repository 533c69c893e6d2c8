#!/usr/bin/env python
"""Voice-conversion CLI (same public surface as the reference
inference_voice_conversion.py:237-281): extract ground-truth durations via
the training alignment path on a source utterance, then re-synthesize with
predicted or ground-truth F0/energy for a target speaker."""

import argparse
import json
import os

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    # some TPU plugins ignore the env var; enforce it via config
    # (without this, JAX_PLATFORMS=cpu still initializes the TPU backend —
    # which HANGS rather than errors when the device tunnel is down)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from radtts_tpu.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax.numpy as jnp

from radtts_tpu.config import update_params
from radtts_tpu.data.dataset import Data, DataCollate, DataLoader
from radtts_tpu.models.hifigan import (denoiser_apply,
                                       hifigan_generator_apply)
from radtts_tpu.models.radtts import radtts_forward, radtts_infer
from radtts_tpu.ops.invertible import precompute_inverses
from radtts_tpu.train.checkpoint import load_radtts_for_inference
from radtts_tpu.vocoder_io import load_vocoder


def is_feature_invalid(x, max_val):
    x = np.asarray(x)
    return bool(np.isnan(x).any() or x.sum() == 0 or x.max() > max_val)


def _frame_budget(n, g, multiple=16):
    m = multiple * g
    return ((int(n) + m - 1) // m) * m


def infer(radtts_path, radtts_config_path, vocoder_path,
          vocoder_config_path, n_samples, sigma, use_amp, seed, output_dir,
          denoising_strength, params_overrides, shuffle, takes, save_mels,
          no_audio, predict_features, sigma_f0=1.0, sigma_energy=0.8,
          save_features=False, plot_features=False, f0_mean=0.0, f0_std=0.0,
          energy_mean=0.0, energy_std=0.0, filter_invalid=False):
    with open(radtts_config_path) as f:
        config = json.load(f)
    update_params(config, params_overrides)
    model_config = config["model_config"]
    data_config = config["data_config"]

    vocoder, denoiser = load_vocoder(vocoder_path, vocoder_config_path)
    os.makedirs(output_dir, exist_ok=True)

    print(f"Loading checkpoint '{radtts_path}'")
    # template-first load (no random init at inference time; see
    # train/checkpoint.py:load_radtts_for_inference); the loader returns
    # HOST leaves, so pin every tree to the device ONCE — numpy leaves
    # passed into jitted calls would re-upload per call
    params, _ = load_radtts_for_inference(radtts_path, model_config)
    params = precompute_inverses(params)
    params, vocoder, denoiser = jax.device_put((params, vocoder, denoiser))
    print(f"Loaded checkpoint '{radtts_path}'")

    ignore_keys = ["training_files", "validation_files"]
    trainset = Data(data_config["training_files"],
                    **{k: v for k, v in data_config.items()
                       if k not in ignore_keys})
    data_config = dict(data_config)
    data_config["dur_max"] = 60
    valset = Data(data_config["validation_files"],
                  **{k: v for k, v in data_config.items()
                     if k not in ignore_keys},
                  speaker_ids=trainset.speaker_ids)
    loader = DataLoader(valset, 1, DataCollate(), shuffle=shuffle,
                        seed=seed, num_workers=1, drop_last=False)

    f0_max = trainset.f0_max
    energy_max = 1.0
    rng = jax.random.PRNGKey(seed)
    g = model_config["n_group_size"]

    for k, batch in enumerate(loader):
        filename = os.path.splitext(
            os.path.basename(batch["audiopaths"][0]))[0]
        f0_gt = batch["f0"].copy()
        energy_gt = batch["energy_avg"].copy()
        suffix_path = "sid{}_sigma{}".format(int(batch["speaker_ids"][0]),
                                             sigma)
        print("sample", k, filename)

        # ground-truth-mel forward with binarized attention -> durations
        # (--use_amp runs the coupling predictor stacks bf16, the analogue
        # of the reference's autocast around this block,
        # inference_voice_conversion.py:153,182)
        from radtts_tpu.ops import amp as _amp
        with _amp.scope(use_amp):
            outputs = radtts_forward(
            params, jnp.asarray(batch["mel"]),
            jnp.asarray(batch["speaker_ids"]), jnp.asarray(batch["text"]),
            jnp.asarray(batch["input_lengths"]),
            jnp.asarray(batch["output_lengths"]),
            binarize_attention_flag=True,
            attn_prior=jnp.asarray(batch["attn_prior"]),
            f0=jnp.asarray(batch["f0"]),
            energy_avg=jnp.asarray(batch["energy_avg"]),
            voiced_mask=jnp.asarray(batch["voiced_mask"]),
            p_voiced=jnp.asarray(batch["p_voiced"]))
        dur_target = jnp.sum(outputs["attn"][0], axis=0)
        dur_target = jnp.floor(dur_target + 0.5).astype(jnp.int32)[None]
        total = int(jnp.sum(dur_target))
        max_frames = _frame_budget(total, g)

        speaker_ids = jnp.asarray(batch["speaker_ids"])
        text = jnp.asarray(batch["text"])

        for j in range(takes):
            audio_path = "{}/{}_{}_{}_denoised.wav".format(
                output_dir, filename, j, suffix_path)
            if os.path.exists(audio_path):
                print("skipping", audio_path)
                continue

            if predict_features:
                f0_bad, energy_bad = True, True
                while f0_bad or energy_bad:
                    rng, sub = jax.random.split(rng)
                    with _amp.scope(use_amp):
                        model_output = radtts_infer(
                            params, sub, speaker_ids, text, sigma,
                            max_frames, dur=dur_target, sigma_f0=sigma_f0,
                            sigma_energy=sigma_energy)
                    f0 = model_output["f0"]
                    energy_avg = model_output["energy_avg"]
                    if filter_invalid:
                        f0_bad = is_feature_invalid(f0, f0_max)
                        energy_bad = is_feature_invalid(energy_avg,
                                                        energy_max)
                    else:
                        f0_bad = energy_bad = False
            else:
                rng, sub = jax.random.split(rng)
                with _amp.scope(use_amp):
                    model_output = radtts_infer(
                        params, sub, speaker_ids, text, sigma, max_frames,
                        dur=dur_target,
                        f0=jnp.asarray(batch["f0"][:, :max_frames]),
                        energy_avg=jnp.asarray(
                            batch["energy_avg"][:, :max_frames]),
                        voiced_mask=jnp.asarray(
                            batch["voiced_mask"][:, :max_frames]),
                        f0_mean=f0_mean, f0_std=f0_std,
                        energy_mean=energy_mean, energy_std=energy_std)
                f0 = model_output["f0"]
                energy_avg = model_output["energy_avg"]

            mel = model_output["mel"][:, :total]

            if save_mels:
                np.save("{}/{}_{}_{}_mel".format(
                    output_dir, filename, j, suffix_path),
                    np.asarray(mel).transpose(0, 2, 1))

            if not no_audio:
                audio = hifigan_generator_apply(vocoder, mel)
                audio_denoised = denoiser_apply(
                    denoiser, audio, strength=denoising_strength)
                from scipy.io.wavfile import write
                wav = np.asarray(audio_denoised)[0].astype(np.float32)
                write("{}/{}_{}_{}.wav".format(
                    output_dir, filename, j, suffix_path),
                    data_config["sampling_rate"], wav)

            if plot_features:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pylab as plt
                fig, axes = plt.subplots(2, 1, figsize=(8, 3))
                axes[0].plot(f0_gt[0], label="gt")
                axes[0].plot(np.asarray(f0)[0], label="pred")
                axes[1].plot(energy_gt[0], label="gt")
                axes[1].plot(np.asarray(energy_avg)[0], label="pred")
                plt.savefig("{}/{}_{}_{}.png".format(
                    output_dir, filename, j, suffix_path))
                plt.close("all")

            if save_features:
                f0_np = np.asarray(f0).copy()
                f0_np[f0_np < data_config["f0_min"]] = 0.0
                np.save("{}/{}_{}_{}_f0".format(
                    output_dir, filename, j, suffix_path), f0_np)
                np.save("{}/{}_{}_{}_energy".format(
                    output_dir, filename, j, suffix_path),
                    np.asarray(energy_avg))

        if k + 1 == n_samples:
            break


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument('-r', '--radtts_path', type=str)
    parser.add_argument('-c', '--radtts_config_path', type=str)
    parser.add_argument('-v', '--vocoder_path', type=str)
    parser.add_argument('-k', '--vocoder_config_path', type=str)
    parser.add_argument('-p', '--params', nargs='+', default=[])
    parser.add_argument('-n', '--n_samples', default=5, type=int)
    parser.add_argument("-s", "--sigma", default=0.8, type=float)
    parser.add_argument("--sigma_f0", default=1.0, type=float)
    parser.add_argument("--sigma_energy", default=1.0, type=float)
    parser.add_argument("--f0_mean", default=0.0, type=float)
    parser.add_argument("--f0_std", default=0.0, type=float)
    parser.add_argument("--energy_mean", default=0.0, type=float)
    parser.add_argument("--energy_std", default=0.0, type=float)
    parser.add_argument("--seed", default=1234, type=int)
    parser.add_argument("--use_amp", action="store_true")
    parser.add_argument("-o", '--output_dir', type=str)
    parser.add_argument("-d", "--denoising_strength", default=0.01,
                        type=float)
    parser.add_argument("--shuffle", action="store_true")
    parser.add_argument("--save_mels", action="store_true")
    parser.add_argument("--no_audio", action="store_true")
    parser.add_argument("--predict_features", action="store_true")
    parser.add_argument("--save_features", action="store_true")
    parser.add_argument("--plot_features", action="store_true")
    parser.add_argument("--filter_invalid", action="store_true")
    parser.add_argument('-t', '--takes', default=1, type=int)
    parser.add_argument("--matmul_precision", default=None,
                        choices=["default", "high", "highest"],
                        help="TPU MXU precision; 'highest' is fp32-exact "
                             "(see inference.py / flagship_parity.py)")
    args = parser.parse_args()

    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    os.makedirs(args.output_dir, exist_ok=True)
    infer(args.radtts_path, args.radtts_config_path, args.vocoder_path,
          args.vocoder_config_path, args.n_samples, args.sigma,
          args.use_amp, args.seed, args.output_dir,
          args.denoising_strength, args.params, args.shuffle, args.takes,
          args.save_mels, args.no_audio, args.predict_features,
          args.sigma_f0, args.sigma_energy, args.save_features,
          args.plot_features, args.f0_mean, args.f0_std, args.energy_mean,
          args.energy_std, args.filter_invalid)
