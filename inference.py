#!/usr/bin/env python
"""Text -> waveform inference CLI (same public surface as the reference
inference.py:159-206: same flags, config JSONs, filelist formats; loads
reference torch checkpoints or native .npz checkpoints).

Pipeline: text -> durations (stage 1 jit) -> attributes + inverse flow
decode at a bucketed static frame budget (stage 2 jit) -> HiFi-GAN ->
denoiser -> wav. The warm-model engine lives in
radtts_tpu/synthesizer.py (shared with serve.py, the HTTP daemon).
"""

import argparse
import json
import os

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    # some TPU plugins ignore the env var; enforce it via config
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from radtts_tpu.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from radtts_tpu.config import update_params


def lines_to_list(filename):
    with open(filename, encoding="utf-8") as f:
        return [line.rstrip() for line in f]


def infer(radtts_path, vocoder_path, vocoder_config_path, text_path,
          speaker, speaker_text, speaker_attributes, sigma, sigma_tkndur,
          sigma_f0, sigma_energy, f0_mean, f0_std, energy_mean, energy_std,
          token_dur_scaling, denoising_strength, n_takes, output_dir,
          use_amp, plot, seed, config, batch_size=1, long_text_chunk=0,
          chunk_gap_ms=120.0, data_parallel=1, weight_dtype="auto",
          aot_dir=""):
    from radtts_tpu.synthesizer import Synthesizer

    # --use_amp: the model stages trace under the bf16 scope (coupling
    # predictor stacks in bfloat16, fp32 islands stay fp32 — the TPU
    # analogue of the reference's `with amp.autocast(use_amp)` around
    # radtts.infer, reference inference.py:121).
    synth = Synthesizer(
        config, radtts_path, vocoder_path, vocoder_config_path,
        use_amp=use_amp, seed=seed, token_dur_scaling=token_dur_scaling,
        f0_mean=f0_mean, f0_std=f0_std, energy_mean=energy_mean,
        energy_std=energy_std, data_parallel=data_parallel,
        weight_dtype=weight_dtype, aot_dir=aot_dir)
    print(f"weight storage: {synth.weight_dtype}")
    print(f"Loaded checkpoint '{radtts_path}'")
    sr = synth.sampling_rate

    text_list = lines_to_list(text_path)
    os.makedirs(output_dir, exist_ok=True)

    # --batch_size > 1: synthesize several lines per dispatch, padded to a
    # bucketed token length (beyond the reference's one-line loop; the
    # masked encoder path makes padded == exact-length results, and pad
    # tokens get duration 0)
    #
    # --long_text_chunk N: lines longer than N encoded tokens are split at
    # sentence boundaries (radtts_tpu/text/chunking.py) into parts that
    # ride the same batched path; their waveforms are rejoined with
    # --chunk_gap_ms of silence and normalized jointly. Bounds the compile
    # buckets and device memory for paragraph-length input (the reference
    # grows its tensors without bound, inference.py:115-156).
    items = []   # (line_idx, part_idx, n_parts, text)
    for i, t in enumerate(text_list):
        if t.startswith("#"):
            continue
        parts = [t]
        if long_text_chunk and long_text_chunk > 0:
            from radtts_tpu.text.chunking import split_text_to_chunks
            parts = split_text_to_chunks(
                t, lambda s: len(synth.encode(s)), long_text_chunk)
            if len(parts) > 1:
                print(f"{i}: split into {len(parts)} chunks "
                      f"(<= {long_text_chunk} tokens each)")
        items.extend((i, p, len(parts), text)
                     for p, text in enumerate(parts))
    gap = np.zeros(int(sr * chunk_gap_ms / 1000.0), np.float32)
    pending = {}  # (line_idx, take) -> [part wavs]
    for b0 in range(0, len(items), max(1, batch_size)):
        chunk = items[b0:b0 + max(1, batch_size)]
        for i, p, n_parts, text in chunk:
            tag = f" [part {p + 1}/{n_parts}]" if n_parts > 1 else ""
            print(f"{i}/{len(text_list)}{tag}: {text}")

        for take in range(n_takes):
            wavs, aux = synth.synthesize(
                [text for _, _, _, text in chunk], speaker,
                speaker_text=speaker_text,
                speaker_attributes=speaker_attributes, sigma=sigma,
                sigma_tkndur=sigma_tkndur, sigma_f0=sigma_f0,
                sigma_energy=sigma_energy,
                denoising_strength=denoising_strength)

            from scipy.io.wavfile import write
            for j, (i, p, n_parts, _) in enumerate(chunk):
                wav = wavs[j]
                suffix_path = ("{}_{}_{}_durscaling{}_sigma{}_sigmatext{}_"
                               "sigmaf0{}_sigmaenergy{}").format(
                    i, take, speaker, token_dur_scaling, sigma,
                    sigma_tkndur, sigma_f0, sigma_energy)
                if plot:
                    # per part, BEFORE the join gate below skips this
                    # iteration: a chunked line gets one features PNG per
                    # chunk (aux rows are per-chunk), named _partK
                    import matplotlib
                    matplotlib.use("Agg")
                    import matplotlib.pylab as plt
                    fig, axes = plt.subplots(2, 1, figsize=(10, 6))
                    axes[0].plot(aux["f0"][j], label="f0")
                    axes[1].plot(aux["energy_avg"][j], label="energy_avg")
                    for ax in axes:
                        ax.legend(loc="best")
                    plt.tight_layout()
                    part_tag = f"_part{p + 1}" if n_parts > 1 else ""
                    fig.savefig(f"{output_dir}/{suffix_path}{part_tag}"
                                "_features.png")
                    plt.close("all")

                if n_parts > 1:
                    # collect chunked-line parts; join + normalize once
                    parts = pending.setdefault((i, take), [None] * n_parts)
                    parts[p] = wav
                    if any(w is None for w in parts):
                        continue
                    joined = [parts[0]]
                    for w in parts[1:]:
                        joined += [gap, w]
                    wav = np.concatenate(joined)
                    del pending[(i, take)]
                wav = wav / np.max(np.abs(wav))
                write("{}/{}_denoised_{}.wav".format(
                    output_dir, suffix_path, denoising_strength), sr,
                    wav.astype(np.float32))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', type=str, help='JSON file config')
    parser.add_argument('-k', '--config_vocoder', type=str,
                        help='vocoder JSON file config')
    parser.add_argument('-p', '--params', nargs='+', default=[])
    parser.add_argument('-r', '--radtts_path', type=str)
    parser.add_argument('-v', '--vocoder_path', type=str)
    parser.add_argument('-t', '--text_path', type=str)
    parser.add_argument('-s', '--speaker', type=str)
    parser.add_argument('--speaker_text', type=str, default=None)
    parser.add_argument('--speaker_attributes', type=str, default=None)
    parser.add_argument('-d', '--denoising_strength', type=float,
                        default=0.0)
    parser.add_argument('-o', "--output_dir", default="results")
    parser.add_argument("--sigma", default=0.8, type=float)
    parser.add_argument("--sigma_tkndur", default=0.666, type=float)
    parser.add_argument("--sigma_f0", default=1.0, type=float)
    parser.add_argument("--sigma_energy", default=1.0, type=float)
    parser.add_argument("--f0_mean", default=0.0, type=float)
    parser.add_argument("--f0_std", default=0.0, type=float)
    parser.add_argument("--energy_mean", default=0.0, type=float)
    parser.add_argument("--energy_std", default=0.0, type=float)
    parser.add_argument("--token_dur_scaling", default=1.00, type=float)
    parser.add_argument("--n_takes", default=1, type=int)
    parser.add_argument("--batch_size", default=1, type=int,
                        help="synthesize this many lines per device "
                             "dispatch (padded/bucketed text lengths)")
    parser.add_argument("--long_text_chunk", default=0, type=int,
                        help="split lines longer than this many encoded "
                             "tokens at sentence boundaries, synthesize "
                             "the chunks (batched), and rejoin the audio; "
                             "0 disables")
    parser.add_argument("--chunk_gap_ms", default=120.0, type=float,
                        help="silence inserted between rejoined chunks")
    parser.add_argument("--data_parallel", default=1, type=int,
                        help="shard each synthesis batch over this many "
                             "devices (weights replicated); combine with "
                             "--batch_size for serving-scale throughput")
    parser.add_argument("--weight_dtype", default="auto",
                        choices=["auto", "float32", "bfloat16"],
                        help="inference weight storage after norm folding "
                             "(ops/fold_norms.py). 'bfloat16' halves the "
                             "resident conv-weight bytes and is bit-equal "
                             "to float32 storage on TPU at default matmul "
                             "precision, but measured NOT faster "
                             "(scripts/ab_fold_bf16.py: 3.47 vs 3.29 ms "
                             "decode) — 'auto' = float32")
    parser.add_argument("--aot_dir", default="",
                        help="directory of serialized compiled "
                             "executables (radtts_tpu/aot_store.py); "
                             "repeated CLI runs at the same shapes skip "
                             "the tunnel compile. Off by default (one-"
                             "shot runs rarely repeat exact shapes); "
                             "serve.py defaults it ON. TPU only")
    parser.add_argument("--use_amp", action="store_true")
    parser.add_argument("--matmul_precision", default=None,
                        choices=["default", "high", "highest"],
                        help="TPU MXU precision: 'default' runs bf16 "
                             "passes (fastest); 'highest' is fp32-exact "
                             "— flagship-scale mel MAE vs the torch "
                             "reference measured 9.1e-2 vs 1.2e-5 "
                             "(scripts/flagship_parity.py)")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--seed", default=1234, type=int)
    args = parser.parse_args()

    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    with open(args.config) as f:
        config = json.load(f)
    update_params(config, args.params)

    infer(args.radtts_path, args.vocoder_path, args.config_vocoder,
          args.text_path, args.speaker, args.speaker_text,
          args.speaker_attributes, args.sigma, args.sigma_tkndur,
          args.sigma_f0, args.sigma_energy, args.f0_mean, args.f0_std,
          args.energy_mean, args.energy_std, args.token_dur_scaling,
          args.denoising_strength, args.n_takes, args.output_dir,
          args.use_amp, args.plot, args.seed, config,
          batch_size=args.batch_size, long_text_chunk=args.long_text_chunk,
          chunk_gap_ms=args.chunk_gap_ms, data_parallel=args.data_parallel,
          weight_dtype=args.weight_dtype, aot_dir=args.aot_dir)
