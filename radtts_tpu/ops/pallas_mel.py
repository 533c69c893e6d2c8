"""Fused Pallas TPU kernel for the STFT -> mel-spectrogram frontend.

One kernel pass per block of frames computes window multiply, real/imag DFT
(as MXU matmuls against the rFFT basis — the same linearization the
reference uses as a conv1d, audio_processing.py:203-224), magnitude, mel
projection, and log compression, without materializing the (T, n_freq)
magnitude spectrogram in HBM.

Matches radtts_tpu.ops.stft.mel_spectrogram numerically (same window, basis,
clamp); that jnp path remains the fallback on non-TPU backends (the kernel
runs in interpreter mode there).

Measured on TPU v5e (B=8, 8 s audio): pallas 3.96 ms vs jnp/rfft 3.59 ms —
XLA already fuses window/|.|/mel into the rfft pipeline well, so the jnp
path stays the default in the data pipeline; this kernel is kept as the
explicitly-fused alternative and a template for further frontend fusion.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radtts_tpu.data.mel_filters import mel_filterbank
from radtts_tpu.ops.stft import hann_window

FRAME_BLOCK = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=4)
def _bases(n_fft, win_length, sampling_rate, n_mels, fmin, fmax):
    """Windowed rFFT bases (n_fft, F_pad) and padded mel basis (F_pad,
    M_pad), fp32 numpy. Window is folded into the DFT bases."""
    n_freq = n_fft // 2 + 1
    f_pad = _round_up(n_freq, 128)
    m_pad = _round_up(n_mels, 128)
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_freq)[None, :]
    ang = -2.0 * np.pi * k * f / n_fft
    w = np.asarray(hann_window(win_length, n_fft))[:, None]
    basis_r = np.zeros((n_fft, f_pad), np.float32)
    basis_i = np.zeros((n_fft, f_pad), np.float32)
    basis_r[:, :n_freq] = np.cos(ang) * w
    basis_i[:, :n_freq] = np.sin(ang) * w
    mel = np.zeros((f_pad, m_pad), np.float32)
    mel[:n_freq, :n_mels] = mel_filterbank(
        sampling_rate, n_fft, n_mels, fmin, fmax).T
    return basis_r, basis_i, mel


def _mel_kernel(frames_ref, basis_r_ref, basis_i_ref, mel_basis_ref,
                out_ref, *, clip_val):
    frames = frames_ref[0]  # (FRAME_BLOCK, n_fft)
    # full-fp32 MXU passes: default precision is bf16, whose magnitude error
    # gets amplified by the log near the clamp floor
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, basis_r_ref[...], precision=hi,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, basis_i_ref[...], precision=hi,
                 preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, mel_basis_ref[...], precision=hi,
                  preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.clip(mel, clip_val))


def mel_spectrogram_pallas(audio, *, filter_length=1024, hop_length=256,
                           win_length=1024, n_mel_channels=80,
                           sampling_rate=22050, mel_fmin=0.0,
                           mel_fmax=8000.0, interpret=None):
    """audio: (B, n) in [-1, 1] -> log-mel (B, T, n_mel). TPU Pallas kernel;
    interpreter mode elsewhere."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, n = audio.shape
    n_fft = filter_length
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop_length
    t_pad = _round_up(n_frames, FRAME_BLOCK)

    # frame gather (cheap; XLA lowers to a strided copy)
    idx = (jnp.arange(t_pad) * hop_length)[:, None] + jnp.arange(n_fft)
    idx = jnp.minimum(idx, x.shape[1] - 1)
    frames = x[:, idx]  # (B, t_pad, n_fft)

    br, bi, mel = _bases(n_fft, win_length, sampling_rate, n_mel_channels,
                         mel_fmin, mel_fmax)
    f_pad = br.shape[1]
    m_pad = mel.shape[1]

    grid = (B, t_pad // FRAME_BLOCK)
    out = pl.pallas_call(
        functools.partial(_mel_kernel, clip_val=1e-5),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, m_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, FRAME_BLOCK, n_fft),
                         lambda b, i: (b, i, 0),
                         memory_space=pltpu.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((n_fft, f_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((n_fft, f_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((f_pad, m_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FRAME_BLOCK, m_pad),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.ANY
                               if interpret else pltpu.VMEM),
        interpret=interpret,
    )(frames, jnp.asarray(br), jnp.asarray(bi), jnp.asarray(mel))
    return out[:, :n_frames, :n_mel_channels]
