#!/usr/bin/env python
"""Interleaved A/B of the vocoder (lhs-dilated vs polyphase convT) and the
denoiser (irfft vs matmul-iDFT) on the live chip. Alternates A,B,A,B,... to
cancel chip-load drift; chained dispatches, one sync per block."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bench import HIFIGAN_V1
from radtts_tpu.models import hifigan
from radtts_tpu.models.hifigan import (denoiser_apply, denoiser_init,
                                       hifigan_generator_init)
from radtts_tpu.ops.stft import hann_window, stft_magnitude_phase

REPS = 10
BLOCKS = 4


def timed(f, x0, *consts):
    x = f(x0, 0, *consts)
    float(np.asarray(x).ravel()[0])
    t = time.perf_counter()
    for i in range(REPS):
        x = f(x, i, *consts)
    float(np.asarray(x).ravel()[0])
    return (time.perf_counter() - t) / REPS, x


def gen_apply_old(params, mel):
    """Generator with the lhs-dilated convT (pre-polyphase)."""
    meta = params["_meta"]
    rates, kernels = meta["upsample_rates"], meta["upsample_kernel_sizes"]
    rk, rd = meta["resblock_kernel_sizes"], meta["resblock_dilation_sizes"]
    from radtts_tpu.ops.conv import conv1d_apply
    x = conv1d_apply(params["conv_pre"], mel, padding=3)
    for i, (u, k) in enumerate(zip(rates, kernels)):
        x = jax.nn.leaky_relu(x, hifigan.LRELU_SLOPE)
        p = params["ups"][i]
        w = p["w"].astype(x.dtype)
        kk = w.shape[0]
        pad = (k - u) // 2
        x = lax.conv_general_dilated(
            x, w, window_strides=(1,),
            padding=[(kk - 1 - pad, kk - 1 - pad)],
            lhs_dilation=(u,), dimension_numbers=("NHC", "HIO", "NHC"))
        x = x + p["b"].astype(x.dtype)
        xs = jnp.zeros_like(x)
        for j, block in enumerate(params["resblocks"][i]):
            xs = xs + hifigan._resblock1_apply(block, x, rk[j], rd[j])
        x = xs / len(rk)
    x = jax.nn.leaky_relu(x)
    x = conv1d_apply(params["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0]


def istft_old(magnitude, phase, n_fft=1024, hop_length=256, win_length=1024):
    B, T, _ = magnitude.shape
    spec = jax.lax.complex(magnitude * jnp.cos(phase),
                           magnitude * jnp.sin(phase))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    w = jnp.asarray(hann_window(win_length, n_fft))
    frames = frames * w[None, None, :]
    n = n_fft + hop_length * (T - 1)
    wsq = jnp.square(w)
    R = n_fft // hop_length
    chunks = frames.reshape(B, T, R, hop_length)
    acc = jnp.zeros((B, T + R - 1, hop_length), frames.dtype)
    wacc = jnp.zeros((T + R - 1, hop_length), jnp.float32)
    wchunks = wsq.reshape(R, hop_length)
    for k in range(R):
        acc = acc.at[:, k:k + T].add(chunks[:, :, k])
        wacc = wacc.at[k:k + T].add(
            jnp.broadcast_to(wchunks[k], (T, hop_length)))
    sig = acc.reshape(B, n)
    wss = wacc.reshape(n)
    tiny = jnp.finfo(jnp.float32).tiny
    sig = jnp.where(wss[None, :] > tiny, sig / jnp.maximum(wss, tiny), sig)
    pad = n_fft // 2
    return sig[:, pad:-pad]


def denoise_old(params, audio, strength=0.01):
    meta = params["_meta"]
    spec, phase = stft_magnitude_phase(
        audio, meta["filter_length"], meta["hop_length"], meta["win_length"])
    spec = jnp.clip(spec - params["bias_spec"] * strength, 0.0)
    return istft_old(spec, phase, meta["filter_length"], meta["hop_length"],
                     meta["win_length"])


def main():
    rng = np.random.default_rng(0)
    voc = hifigan_generator_init(jax.random.PRNGKey(1), HIFIGAN_V1)
    den = denoiser_init(voc)
    mel = jnp.asarray(rng.standard_normal((1, 608, 80)).astype(np.float32))
    audio = jnp.asarray(
        (rng.standard_normal((1, 608 * 256)) * 0.1).astype(np.float32))

    @jax.jit
    def voc_new(m, i, v):
        y = hifigan.hifigan_generator_apply(v, m + i * 1e-30)
        return m + jnp.mean(y) * 1e-30

    @jax.jit
    def voc_old(m, i, v):
        y = gen_apply_old(v, m + i * 1e-30)
        return m + jnp.mean(y) * 1e-30

    @jax.jit
    def den_new(a, i, d):
        y = denoiser_apply(d, a + i * 1e-30, 0.01)
        return a + jnp.mean(y) * 1e-30

    @jax.jit
    def den_old(a, i, d):
        y = denoise_old(d, a + i * 1e-30, 0.01)
        return a + jnp.mean(y) * 1e-30

    # parity first
    y_new = np.asarray(jax.jit(hifigan.hifigan_generator_apply)(voc, mel))
    y_old = np.asarray(jax.jit(gen_apply_old)(voc, mel))
    print("convT parity max-abs-diff:", np.abs(y_new - y_old).max(),
          flush=True)

    vn, vo, dn, do = [], [], [], []
    for b in range(BLOCKS):
        t, mel = timed(voc_old, mel, voc); vo.append(t)
        t, mel = timed(voc_new, mel, voc); vn.append(t)
        t, audio = timed(den_old, audio, den); do.append(t)
        t, audio = timed(den_new, audio, den); dn.append(t)
        print(f"block {b}: voc old {vo[-1]*1e3:.2f} new {vn[-1]*1e3:.2f} | "
              f"den old {do[-1]*1e3:.2f} new {dn[-1]*1e3:.2f} ms", flush=True)

    print(f"vocoder: old {min(vo)*1e3:.2f} -> new {min(vn)*1e3:.2f} ms (min)")
    print(f"denoiser: old {min(do)*1e3:.2f} -> new {min(dn)*1e3:.2f} ms (min)")


if __name__ == "__main__":
    main()
