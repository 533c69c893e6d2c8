"""STFT / mel-spectrogram frontend.

Numerically equivalent to the reference's conv1d-implemented STFT
(reference: audio_processing.py:192-291: reflect pad n_fft/2, hann window,
Fourier-basis conv == windowed rFFT) and TacotronSTFT mel pipeline
(audio_processing.py:116-154: slaney mel filterbank matmul + log-clamp
dynamic range compression).

Implementation: frame gather + jnp.fft.rfft + one (n_freq, n_mel) matmul —
XLA fuses the window multiply and |.| into the surrounding ops. Inverse STFT
(for the vocoder denoiser) uses overlap-add with window-sumsquare correction.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from radtts_tpu.data.mel_filters import mel_filterbank


@functools.lru_cache(maxsize=8)
def hann_window(win_length, n_fft):
    # cached as numpy (never cache arrays created under a jit trace)
    w = scipy.signal.get_window("hann", win_length, fftbins=True)
    lpad = (n_fft - win_length) // 2
    return np.pad(w, (lpad, n_fft - win_length - lpad)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def mel_basis(sampling_rate, n_fft, n_mels, fmin, fmax):
    return mel_filterbank(sampling_rate, n_fft, n_mels, fmin, fmax)


@functools.lru_cache(maxsize=4)
def _idft_bases(n_fft):
    """Real iDFT as two (n_freq, n_fft) matmul bases:
    x[n] = sum_k w_k (re_k cos(2pi k n/N) - im_k sin(2pi k n/N)) / N,
    w_k = 2 except DC and Nyquist. TPU's FFT lowering is ~17x slower than
    an MXU matmul at denoiser shapes (measured: irfft 37 ms vs 2.1 ms for
    (609, 513) @ (513, 1024) on one chip), so the inverse goes via matmuls."""
    F = n_fft // 2 + 1
    k = (np.arange(F)[:, None] * np.arange(n_fft)[None, :]
         * (2.0 * np.pi / n_fft))
    w = np.full((F, 1), 2.0, np.float64)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0  # the last bin is Nyquist (unpaired) only for even N
    icos = (np.cos(k) * w / n_fft).astype(np.float32)
    isin = (np.sin(k) * w / n_fft).astype(np.float32)
    return icos, isin


@functools.lru_cache(maxsize=4)
def _dft_bases(n_fft):
    """Forward real DFT as two (n_fft, n_freq) matmul bases:
    re_k = sum_n x[n] cos(2pi k n/N), im_k = -sum_n x[n] sin(2pi k n/N).
    Same rationale as _idft_bases: the TPU FFT lowering loses to an MXU
    matmul by an order of magnitude at denoiser shapes."""
    F = n_fft // 2 + 1
    k = (np.arange(n_fft)[:, None] * np.arange(F)[None, :]
         * (2.0 * np.pi / n_fft))
    return np.cos(k).astype(np.float32), (-np.sin(k)).astype(np.float32)


def frame_signal(audio, n_fft, hop_length):
    """audio: (B, n) -> frames (B, T, n_fft) with reflect padding n_fft//2."""
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop_length
    if n_fft % hop_length == 0:
        # scatter/gather-free framing (mirror of the istft overlap-add):
        # with R = n_fft // hop, frame t = concat of hop-sized chunks
        # t..t+R-1, so R shifted reshape-views concatenated beat a
        # (T, n_fft)-sized gather (TPU gathers are serialized; measured as
        # the denoiser's hotspot after the DFT matmuls)
        R = n_fft // hop_length
        n_chunks = x.shape[1] // hop_length
        chunks = x[:, : n_chunks * hop_length].reshape(
            x.shape[0], n_chunks, hop_length)
        return jnp.concatenate(
            [chunks[:, k:k + n_frames] for k in range(R)], axis=-1)
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    return x[:, idx]


def stft_magnitude_phase(audio, n_fft=1024, hop_length=256, win_length=1024):
    """audio: (B, n) in [-1, 1]. Returns (magnitude, phase) each
    (B, T, n_fft//2+1)."""
    frames = frame_signal(audio, n_fft, hop_length)
    w = jnp.asarray(hann_window(win_length, n_fft))
    spec = jnp.fft.rfft(frames * w[None, None, :], axis=-1)
    mag = jnp.abs(spec).astype(jnp.float32)
    phase = jnp.angle(spec).astype(jnp.float32)
    return mag, phase


def stft_reim(audio, n_fft=1024, hop_length=256, win_length=1024):
    """audio: (B, n) -> (re, im) each (B, T, n_fft//2+1), via the matmul
    DFT bases (MXU) rather than jnp.fft.rfft (slow TPU lowering)."""
    frames = frame_signal(audio, n_fft, hop_length)
    w = jnp.asarray(hann_window(win_length, n_fft))
    fw = frames * w[None, None, :]
    cosF, nsinF = _dft_bases(n_fft)
    re = jnp.matmul(fw, jnp.asarray(cosF),
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(fw, jnp.asarray(nsinF),
                    precision=jax.lax.Precision.HIGHEST)
    return re, im


def istft_reim(re, im, n_fft=1024, hop_length=256, win_length=1024):
    """Inverse STFT from the complex spectrum's (re, im) parts via matmul
    iDFT + overlap-add with window-sumsquare correction
    (reference: audio_processing.py:257-286). re/im: (B, T, F)."""
    B, T, _ = re.shape
    # real iDFT via two MXU matmuls instead of jnp.fft.irfft (see _idft_bases;
    # HIGHEST precision keeps fp32 accumulation — error vs irfft ~1e-6 at
    # unit magnitudes, and the matmul is trivially cheap at these shapes)
    icos, isin = _idft_bases(n_fft)
    frames = (jnp.matmul(re, jnp.asarray(icos),
                         precision=jax.lax.Precision.HIGHEST)
              - jnp.matmul(im, jnp.asarray(isin),
                           precision=jax.lax.Precision.HIGHEST))
    w = jnp.asarray(hann_window(win_length, n_fft))
    frames = frames * w[None, None, :]

    n = n_fft + hop_length * (T - 1)
    wsq = jnp.square(w)
    if n_fft % hop_length == 0:
        # scatter-free overlap-add: with R = n_fft // hop frames split into
        # R hop-sized chunks, chunk k of frame t lands at output row t + k;
        # shift-pad each chunk stream and sum (19 ms -> fused adds on TPU,
        # the .at[].add scatter path is the denoiser's hotspot otherwise)
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
    else:
        idx = (jnp.arange(T)[:, None] * hop_length
               + jnp.arange(n_fft)[None, :]).reshape(-1)
        sig = jnp.zeros((B, n), frames.dtype)
        sig = sig.at[:, idx].add(frames.reshape(B, -1))
        wss = jnp.zeros((n,), jnp.float32)
        wss = wss.at[idx].add(jnp.tile(wsq, T))
    tiny = jnp.finfo(jnp.float32).tiny
    sig = jnp.where(wss[None, :] > tiny, sig / jnp.maximum(wss, tiny), sig)
    pad = n_fft // 2
    return sig[:, pad:-pad]


def istft(magnitude, phase, n_fft=1024, hop_length=256, win_length=1024):
    """Inverse STFT from (magnitude, phase): the reference-shaped interface
    (audio_processing.py:257-286). magnitude/phase: (B, T, F)."""
    return istft_reim(magnitude * jnp.cos(phase), magnitude * jnp.sin(phase),
                      n_fft, hop_length, win_length)


def griffin_lim(rng, magnitudes, n_iters=30, n_fft=1024, hop_length=256,
                win_length=1024):
    """Phase reconstruction from magnitudes (B, T, F) by iterated
    stft/istft projection (reference: audio_processing.py:79-95 — random
    initial phase, n_iters refinement rounds). Jit-friendly via lax.scan."""
    import jax.random

    phase = jax.random.uniform(rng, magnitudes.shape, jnp.float32,
                               -np.pi, np.pi)
    signal = istft(magnitudes, phase, n_fft, hop_length, win_length)

    def body(signal, _):
        _, ang = stft_magnitude_phase(signal, n_fft, hop_length, win_length)
        ang = ang[:, :magnitudes.shape[1]]
        return istft(magnitudes, ang, n_fft, hop_length, win_length), None

    signal, _ = jax.lax.scan(body, signal, None, length=n_iters)
    return signal


def dynamic_range_compression(x, C=1.0, clip_val=1e-5):
    return jnp.log(jnp.clip(x, clip_val) * C)


def mel_spectrogram(audio, *, filter_length=1024, hop_length=256,
                    win_length=1024, n_mel_channels=80, sampling_rate=22050,
                    mel_fmin=0.0, mel_fmax=8000.0):
    """audio: (B, n) in [-1, 1] -> log-mel (B, T, n_mel)."""
    mag, _ = stft_magnitude_phase(audio, filter_length, hop_length,
                                  win_length)
    basis = jnp.asarray(mel_basis(sampling_rate, filter_length,
                                  n_mel_channels, mel_fmin, mel_fmax))
    mel = jnp.einsum("btf,mf->btm", mag, basis,
                     preferred_element_type=jnp.float32)
    return dynamic_range_compression(mel)
