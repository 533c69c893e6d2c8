"""HiFi-GAN vocoder: generator (transposed-conv upsampling + multi-receptive
-field resblocks) and spectral-bias denoiser (behavior parity with reference
hifigan_models.py:151-225 and hifigan_denoiser.py:25-59).

TPU notes: channels-last; ConvTranspose1d is lowered as an input-dilated
conv_general_dilated (kernel pre-flipped at conversion), which XLA maps onto
the MXU; weight norm is collapsed at load (inference path).
"""

import os

import jax
import jax.numpy as jnp
from jax import lax

from radtts_tpu.convert import t2j
from radtts_tpu.ops.conv import conv1d_apply
from radtts_tpu.ops.static import static
from radtts_tpu.ops.stft import (istft_reim, stft_magnitude_phase,
                                 stft_reim)

LRELU_SLOPE = 0.1
_DIMNUMS = ("NHC", "HIO", "NHC")


class AttrDict(dict):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self


def conv_transpose1d_apply(params, x, stride, padding):
    """x: (B, T, C_in). Weight already stored flipped as (K, C_in, C_out)
    so that an lhs-dilated conv reproduces torch ConvTranspose1d.

    A polyphase depth-to-space rewrite (one stride-1 conv emitting all
    `stride` phases as channels) was A/B-measured on-chip and is SLOWER
    (22 vs 16 ms for the full generator): XLA's TPU conv emitter already
    skips the inserted zeros of lhs_dilation, and the depth-to-space
    reshape breaks fusion with the following MRF stack. Keep lhs-dilated."""
    w = params["w"].astype(x.dtype)
    k = w.shape[0]
    y = lax.conv_general_dilated(
        x, w, window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,), dimension_numbers=_DIMNUMS)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


def _collapse_weight_norm(sd, prefix):
    """Read a weight-normed torch conv and collapse to a single kernel."""
    import numpy as np
    g = np.asarray(sd[prefix + ".weight_g"].detach().cpu().numpy())
    v = np.asarray(sd[prefix + ".weight_v"].detach().cpu().numpy())
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / norm


def _conv_from_sd(sd, prefix, weight_norm=True):
    import numpy as np
    if weight_norm:
        w = _collapse_weight_norm(sd, prefix)
    else:
        w = np.asarray(sd[prefix + ".weight"].detach().cpu().numpy())
    p = {"w": np.asarray(np.transpose(w, (2, 1, 0)), np.float32)}
    if prefix + ".bias" in sd:
        p["b"] = t2j(sd[prefix + ".bias"])
    return p


def _convT_from_sd(sd, prefix):
    """torch ConvTranspose1d weight (C_in, C_out, K) -> flipped (K, C_in,
    C_out) for the lhs-dilated equivalent conv."""
    import numpy as np
    w = _collapse_weight_norm(sd, prefix)   # (in, out, k)
    w = w[:, :, ::-1]                        # spatial flip
    p = {"w": np.asarray(np.ascontiguousarray(np.transpose(w, (2, 0, 1))),
                         np.float32)}
    if prefix + ".bias" in sd:
        p["b"] = t2j(sd[prefix + ".bias"])
    return p


def _remap_legacy_keys(sd):
    """Old checkpoints use flat resblocks.N.*; new layout is
    resblocks.{N//3}.{N%3}.* (reference: hifigan_models.py:186-198)."""
    out = {}
    for k, v in sd.items():
        new_k = k
        if "resblocks" in k:
            parts = k.split(".")
            if len(parts) == 5:
                layer = int(parts[1])
                new_k = (f"resblocks.{layer // 3}.{layer % 3}."
                         + ".".join(parts[2:]))
        out[new_k] = v
    return out


def _get_padding(kernel_size, dilation=1):
    return int((kernel_size * dilation - dilation) / 2)


def hifigan_generator_init(key, h):
    """Random init (normal(0, 0.01) convs like reference init_weights,
    hifigan_utils.py:25-28) — used for benchmarks / vocoder fine-tuning."""
    import numpy as np

    def conv(key, in_ch, out_ch, k):
        w = 0.01 * jax.random.normal(key, (k, in_ch, out_ch))
        return {"w": w, "b": jnp.zeros((out_ch,))}

    rates = h["upsample_rates"]
    kernels = h["upsample_kernel_sizes"]
    rk = h["resblock_kernel_sizes"]
    rd = h["resblock_dilation_sizes"]
    ch0 = h["upsample_initial_channel"]
    keys = iter(jax.random.split(key, 4096))

    params = {"conv_pre": conv(next(keys), 80, ch0, 7)}
    ups, resblocks = [], []
    for i, (u, k) in enumerate(zip(rates, kernels)):
        cin = ch0 // (2 ** i)
        cout = ch0 // (2 ** (i + 1))
        ups.append(conv(next(keys), cin, cout, k))
        group = []
        for j, ksz in enumerate(rk):
            if h["resblock"] == "1":
                block = {"convs1": [conv(next(keys), cout, cout, ksz)
                                    for _ in range(3)],
                         "convs2": [conv(next(keys), cout, cout, ksz)
                                    for _ in range(3)]}
            else:
                block = {"convs": [conv(next(keys), cout, cout, ksz)
                                   for _ in range(2)]}
            group.append(block)
        resblocks.append(group)
    params["ups"] = ups
    params["resblocks"] = resblocks
    params["conv_post"] = conv(next(keys), cout, 1, 7)
    params["_meta"] = static(
        upsample_rates=tuple(rates),
        upsample_kernel_sizes=tuple(kernels),
        resblock_kernel_sizes=tuple(rk),
        resblock_dilation_sizes=tuple(tuple(d) for d in rd),
        resblock=h["resblock"],
    )
    return params


def hifigan_generator_from_torch(state_dict, h):
    """Build generator params from a torch state_dict + AttrDict config."""
    sd = _remap_legacy_keys(state_dict)
    n_ups = len(h["upsample_rates"])
    n_kernels = len(h["resblock_kernel_sizes"])
    resblock_kind = h["resblock"]

    params = {"conv_pre": _conv_from_sd(sd, "conv_pre")}
    ups, resblocks = [], []
    for i in range(n_ups):
        ups.append(_convT_from_sd(sd, f"ups.{i}"))
        group = []
        for j in range(n_kernels):
            base = f"resblocks.{i}.{j}"
            if resblock_kind == "1":
                block = {
                    "convs1": [_conv_from_sd(sd, f"{base}.convs1.{m}")
                               for m in range(3)],
                    "convs2": [_conv_from_sd(sd, f"{base}.convs2.{m}")
                               for m in range(3)],
                }
            else:
                block = {"convs": [_conv_from_sd(sd, f"{base}.convs.{m}")
                                   for m in range(2)]}
            group.append(block)
        resblocks.append(group)
    params["ups"] = ups
    params["resblocks"] = resblocks
    params["conv_post"] = _conv_from_sd(sd, "conv_post")
    params["_meta"] = static(
        upsample_rates=tuple(h["upsample_rates"]),
        upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
        resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in h["resblock_dilation_sizes"]),
        resblock=resblock_kind,
    )
    return params


def _resblock1_apply(block, x, kernel_size, dilations):
    for c1, c2, d in zip(block["convs1"], block["convs2"], dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = conv1d_apply(c1, xt, padding=_get_padding(kernel_size, d),
                          dilation=d)
        xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
        xt = conv1d_apply(c2, xt, padding=_get_padding(kernel_size, 1))
        x = xt + x
    return x


def _resblock2_apply(block, x, kernel_size, dilations):
    for c, d in zip(block["convs"], dilations):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = conv1d_apply(c, xt, padding=_get_padding(kernel_size, d),
                          dilation=d)
        x = xt + x
    return x


def gaussian_blur_kernels(kernel_size, sigmas):
    """Normalized 2D gaussian kernels, one per sigma
    (reference: hifigan_models.py:34-69). Returns (n_sigmas, kh, kw) fp32."""
    import numpy as np

    kh, kw = kernel_size
    gy = np.arange(kh, dtype=np.float32)[:, None]
    gx = np.arange(kw, dtype=np.float32)[None, :]
    kernels = []
    for s in sigmas:
        k = (np.exp(-(((gy - (kh - 1) / 2) / s) ** 2) / 2)
             * np.exp(-(((gx - (kw - 1) / 2) / s) ** 2) / 2))
        kernels.append(k / k.sum())
    return jnp.asarray(np.stack(kernels))


def gaussian_blur_augmentation(rng, mel, kernel_size=(5, 5),
                               sigmas=(0.1, 0.5, 1.0), p_blurring=0.0):
    """With probability p_blurring, blur the (B, T, n_mel) mel with a
    randomly chosen gaussian kernel (reference: hifigan_models.py:71-80;
    used on the generator's input mel during vocoder fine-tuning). Pure
    function of the rng key; jit-friendly."""
    import jax.random

    if p_blurring <= 0.0:
        return mel
    k_rng, p_rng = jax.random.split(rng)
    kernels = gaussian_blur_kernels(kernel_size, sigmas)
    i = jax.random.randint(k_rng, (), 0, kernels.shape[0])
    kernel = kernels[i][None, None]  # (1, 1, kh, kw) OIHW
    pad = (kernel_size[0] - 1) // 2
    x = jnp.pad(mel[:, None], ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                mode="reflect")
    blurred = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
    return jnp.where(jax.random.uniform(p_rng, ()) > p_blurring, mel,
                     blurred)


def _mrf_is_pallas_compatible(meta, rk, rd):
    from radtts_tpu.ops.pallas_mrf import DILATIONS, KERNEL_SIZES
    return (meta["resblock"] == "1"
            and tuple(rk) == KERNEL_SIZES[: len(rk)]
            and all(tuple(d) == DILATIONS for d in rd))


def hifigan_generator_apply(params, mel, *, mrf_impl="auto"):
    """mel: (B, T, 80) -> waveform (B, T * prod(upsample_rates)).

    mrf_impl: "auto" (default — the fused Pallas kernel on TPU, plain XLA
    elsewhere), "xla", "pallas", or "fold". The Pallas route sends each
    narrow (C<=128) upsample stage's resblock stack through
    ops/pallas_mrf.py when the architecture matches the standard
    (3,7,11)x(1,3,5) ResBlock1 MRF — measured 1.7-2.3x per stage on v5e.
    "fold" runs the C<=64 stages as time-folded block-banded convs
    (ops/folded_conv.py: F consecutive frames packed into channels so the
    MXU sees 128-wide matmuls instead of 32x32) — exact to rounding,
    pending on-chip A/B (scripts/ab_mrf_fold.py)."""
    if mrf_impl == "auto":
        # jax_default_device may hold a Device OR a platform string
        # (jax.default_device accepts both)
        dd = jax.config.jax_default_device
        platform = (dd if isinstance(dd, str)
                    else dd.platform if dd is not None
                    else jax.default_backend())
        mrf_impl = "pallas" if platform == "tpu" else "xla"
    meta = params["_meta"]
    rates = meta["upsample_rates"]
    kernels = meta["upsample_kernel_sizes"]
    rk = meta["resblock_kernel_sizes"]
    rd = meta["resblock_dilation_sizes"]
    is_rb1 = meta["resblock"] == "1"
    use_pallas = (mrf_impl == "pallas"
                  and _mrf_is_pallas_compatible(meta, rk, rd))
    if use_pallas:
        from radtts_tpu.ops.pallas_mrf import (mrf_weights_from_params,
                                               pallas_mrf)
    use_fold = mrf_impl == "fold" and is_rb1
    if use_fold:
        from radtts_tpu.ops.folded_conv import (fold_time,
                                                resblock1_apply_folded,
                                                unfold_time)

    x = conv1d_apply(params["conv_pre"], mel, padding=3)
    for i, (u, k) in enumerate(zip(rates, kernels)):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = conv_transpose1d_apply(params["ups"][i], x, u, (k - u) // 2)
        if (use_pallas and x.shape[-1] == 32
                and os.environ.get("RADTTS_MRF_FOLD", "1") != "0"):
            # DEFAULT since the round-4 on-chip A/B (PROF_SET=fold,
            # scripts/profile_vocoder.py: full vocoder+denoiser
            # 7.98 -> 6.23 ms): the C=32 tail stage runs as the in-kernel
            # time-folded MRF — 4 frames packed into 128 lanes so every
            # conv is a full-width MXU dot (ops/pallas_mrf.py
            # pallas_mrf_folded). RADTTS_MRF_FOLD=0 opts out.
            from radtts_tpu.ops.pallas_mrf import pallas_mrf_folded
            x = pallas_mrf_folded(x, mrf_weights_from_params(
                params["resblocks"][i]), fold=4, tile=1024)
            continue
        if use_pallas and x.shape[-1] <= 128:
            # C=256 stages don't fit VMEM (k=11 weight stacks alone are
            # 17 MB) and are cheap under XLA; fuse only the narrow stages.
            # Tile sizes are A/B-measured per width: 1536 helps C=64
            # (2.51->1.62 ms) but not C=32/C=128; 1792+ OOMs VMEM.
            tile = 1536 if x.shape[-1] == 64 else 1024
            x = pallas_mrf(x, mrf_weights_from_params(
                params["resblocks"][i]), tile=tile)
            continue
        if (use_pallas and x.shape[-1] == 256
                and os.environ.get("RADTTS_MRF_WIDE", "1") != "0"):
            # DEFAULT since the round-4 on-chip A/B (scripts/
            # profile_vocoder.py: full vocoder+denoiser 9.70 -> 7.78 ms):
            # one per-resblock kernel invocation with bf16 weight storage —
            # within what DEFAULT matmul precision does to fp32 anyway.
            # RADTTS_MRF_WIDE=0 opts out.
            from radtts_tpu.ops.pallas_mrf import pallas_mrf_wide
            x = pallas_mrf_wide(x, mrf_weights_from_params(
                params["resblocks"][i]))
            continue
        C, T = x.shape[-1], x.shape[1]
        if use_fold and C <= 64 and 128 % C == 0 and T % (128 // C) == 0:
            F = 128 // C
            X = fold_time(x, F)
            Xs = jnp.zeros_like(X)
            for j, block in enumerate(params["resblocks"][i]):
                Xs = Xs + resblock1_apply_folded(block, X, rk[j], rd[j], F,
                                                 lrelu_slope=LRELU_SLOPE)
            x = unfold_time(Xs / len(rk), F)
            continue
        xs = jnp.zeros_like(x)
        for j, block in enumerate(params["resblocks"][i]):
            if is_rb1:
                xs = xs + _resblock1_apply(block, x, rk[j], rd[j])
            else:
                xs = xs + _resblock2_apply(block, x, rk[j], rd[j])
        x = xs / len(rk)
    x = jax.nn.leaky_relu(x)  # default torch slope 0.01 (reference line 211)
    C, T = x.shape[-1], x.shape[1]
    if (C <= 64 and 128 % C == 0 and T % (128 // C) == 0
            and os.environ.get("RADTTS_POST_FOLD", "1") != "0"):
        # DEFAULT since the round-5 on-chip cuts (scripts/
        # profile_vocoder.py: the post conv's marginal was 0.66 ms vs a
        # 0.05 ms floor): C_out=1 fills ONE of the MXU's 128 output
        # lanes, so fold 128//C frames into channels and run the k=7
        # conv as 3 dense (U, 128*C_in) x (128*C_in, 128) taps — exact
        # to reduction order (ops/folded_conv.py fold_conv_weights; the
        # same block-banded derivation as the folded MRF tail).
        # RADTTS_POST_FOLD=0 opts out.
        from radtts_tpu.ops.conv import effective_weight
        from radtts_tpu.ops.folded_conv import (fold_conv_weights,
                                                fold_time, folded_conv_apply,
                                                unfold_time)
        F = 128 // C
        pp = params["conv_post"]
        fw, fb, fpad = fold_conv_weights(
            effective_weight(pp), pp.get("b"), pad=3, dilation=1, fold=F)
        y = folded_conv_apply(fw, fb, fpad, fold_time(x, F))
        x = unfold_time(y, F)
    else:
        x = conv1d_apply(params["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0]


def hifigan_generator_to_torch(params):
    """Inverse of hifigan_generator_from_torch: emit a reference-compatible
    weight-normed state_dict ({'generator': sd} is the on-disk format,
    hifigan ckpt convention) so TPU-fine-tuned vocoders load in the torch
    reference and back through load_vocoder. weight_v = w with
    weight_g = ||w|| over the non-0 dims is a valid weight-norm
    factorization that collapses back to w exactly."""
    import numpy as np
    import torch

    def conv_entry(out, prefix, p, transposed=False):
        w = np.asarray(p["w"])
        if transposed:
            # ours: flipped (K, C_in, C_out) -> torch (C_in, C_out, K)
            w = np.ascontiguousarray(np.transpose(w, (1, 2, 0))[:, :, ::-1])
        else:
            # ours: (K, C_in, C_out) -> torch (C_out, C_in, K)
            w = np.ascontiguousarray(np.transpose(w, (2, 1, 0)))
        g = np.sqrt((w ** 2).sum(axis=tuple(range(1, w.ndim)),
                                 keepdims=True))
        out[prefix + ".weight_g"] = torch.from_numpy(g.astype(np.float32))
        out[prefix + ".weight_v"] = torch.from_numpy(w.astype(np.float32))
        if "b" in p:
            out[prefix + ".bias"] = torch.from_numpy(
                np.array(p["b"], np.float32, copy=True))

    meta = params["_meta"]
    sd = {}
    conv_entry(sd, "conv_pre", params["conv_pre"])
    for i, up in enumerate(params["ups"]):
        conv_entry(sd, f"ups.{i}", up, transposed=True)
    for i, group in enumerate(params["resblocks"]):
        for j, block in enumerate(group):
            base = f"resblocks.{i}.{j}"
            if meta["resblock"] == "1":
                for m, c in enumerate(block["convs1"]):
                    conv_entry(sd, f"{base}.convs1.{m}", c)
                for m, c in enumerate(block["convs2"]):
                    conv_entry(sd, f"{base}.convs2.{m}", c)
            else:
                for m, c in enumerate(block["convs"]):
                    conv_entry(sd, f"{base}.convs.{m}", c)
    conv_entry(sd, "conv_post", params["conv_post"])
    return sd


# ---------------------------------------------------------------------------
# Denoiser (reference: hifigan_denoiser.py:25-59)
# ---------------------------------------------------------------------------


def denoiser_init(generator_params, filter_length=1024, n_overlap=4,
                  win_length=1024, mode="zeros", wrap=None):
    """Compute the vocoder bias spectrum (reference hifigan_denoiser.py:
    22-40). `wrap`, when given, is applied to the jitted bias program —
    the serving path passes an AOT-store wrapper (aot_store.AOTStore)
    because this one-shot compile costs ~34 s per process through a
    tunneled compile service and the XLA persistent cache does not cover
    that backend (measured 2026-08-20)."""
    hop = int(filter_length / n_overlap)
    if mode == "zeros":
        mel_input = jnp.zeros((1, 88, 80))
    elif mode == "normal":
        mel_input = jax.random.normal(jax.random.PRNGKey(0), (1, 88, 80))
    else:
        raise ValueError(f"Mode {mode} not supported")

    @jax.jit
    def _bias(gen_params, mel):
        audio = hifigan_generator_apply(gen_params, mel)
        spec, _ = stft_magnitude_phase(audio, filter_length, hop, win_length)
        return spec

    if wrap is not None:
        _bias = wrap(_bias)
    bias_spec = _bias(generator_params, mel_input)
    return {"bias_spec": bias_spec[:, 0:1, :],
            "_meta": static(filter_length=filter_length, hop_length=hop,
                            win_length=win_length)}


def denoiser_apply(params, audio, strength=0.1):
    """audio: (B, n). Subtract strength x vocoder bias spectrum.

    Magnitude-domain subtraction at unchanged phase == rescaling the complex
    spectrum by (mag - strength*bias)+ / mag, so the whole round trip stays
    in (re, im): no angle/cos/sin transcendentals, and both DFTs ride the
    MXU (see ops/stft.py matmul bases). Bit-equivalent to the reference's
    magnitude/phase formulation (hifigan_denoiser.py:54-59) up to fp32
    rounding.

    strength <= 0 short-circuits to the input via lax.cond — strength is a
    device scalar in the serving/CLI graphs (never a retrace), and the
    runtime branch skips the whole STFT round trip. (The reference runs
    the round trip even at strength 0, inference.py:133; on COLA windows
    that round trip is the identity up to fp32 edge effects, so skipping
    is a deviation of < 1e-6.)"""
    meta = params["_meta"]

    def denoise(audio):
        re, im = stft_reim(audio, meta["filter_length"],
                           meta["hop_length"], meta["win_length"])
        mag = jnp.sqrt(re * re + im * im)
        tiny = jnp.finfo(jnp.float32).tiny
        scale = jnp.clip(mag - params["bias_spec"] * strength, 0.0) / \
            jnp.maximum(mag, tiny)
        return istft_reim(re * scale, im * scale, meta["filter_length"],
                          meta["hop_length"], meta["win_length"])

    strength = jnp.asarray(strength, jnp.float32)
    # the STFT round trip changes the tail length (frame quantization);
    # conform the identity branch to the same output shape
    n_out = jax.eval_shape(denoise, audio).shape[-1]
    n_in = audio.shape[-1]

    def identity(a):
        if n_out <= n_in:
            return a[..., :n_out]
        return jnp.pad(a, ((0, 0), (0, n_out - n_in)))

    return lax.cond(strength > 0, denoise, identity, audio)
