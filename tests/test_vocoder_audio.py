"""HiFi-GAN generator/denoiser and STFT/mel frontend parity."""

import numpy as np
import jax
import torch

import jax.numpy as jnp

from tests.ref_utils import install_reference

install_reference()

from audio_processing import STFT as RefSTFT  # noqa: E402
from audio_processing import TacotronSTFT as RefTacotronSTFT  # noqa: E402
from hifigan_denoiser import Denoiser as RefDenoiser  # noqa: E402
from hifigan_env import AttrDict as RefAttrDict  # noqa: E402
from hifigan_models import Generator as RefGenerator  # noqa: E402

from radtts_tpu.models.hifigan import (denoiser_apply, denoiser_init,  # noqa
                                       hifigan_generator_apply,
                                       hifigan_generator_from_torch)
from radtts_tpu.ops.stft import (istft, mel_spectrogram,  # noqa: E402
                                 stft_magnitude_phase)

H_SMALL = {
    "resblock": "1",
    "upsample_rates": [4, 4, 2],
    "upsample_kernel_sizes": [8, 8, 4],
    "upsample_initial_channel": 64,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "gaussian_blur": {"p_blurring": 0.0},
}


def test_hifigan_generator_parity():
    torch.manual_seed(0)
    h = RefAttrDict(dict(H_SMALL))
    ref = RefGenerator(h).eval()
    mel = torch.randn(2, 80, 17)
    with torch.no_grad():
        wav_ref = ref(mel)  # (B, 1, T)

    params = hifigan_generator_from_torch(ref.state_dict(), H_SMALL)
    wav = hifigan_generator_apply(params,
                                  jnp.asarray(mel.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(wav), wav_ref[:, 0].numpy(),
                               rtol=1e-3, atol=1e-4)


def test_stft_and_mel_parity():
    torch.manual_seed(1)
    audio = torch.rand(2, 5000) * 1.6 - 0.8
    ref_stft = RefSTFT(filter_length=1024, hop_length=256, win_length=1024)
    with torch.no_grad():
        mag_ref, phase_ref = ref_stft.transform(audio)

    mag, phase = stft_magnitude_phase(jnp.asarray(audio.numpy()), 1024, 256,
                                      1024)
    np.testing.assert_allclose(np.asarray(mag).transpose(0, 2, 1),
                               mag_ref.numpy(), rtol=1e-3, atol=1e-4)

    ref_mel_fn = RefTacotronSTFT(1024, 256, 1024, 80, 22050, 0.0, 8000.0)
    with torch.no_grad():
        mel_ref = ref_mel_fn.mel_spectrogram(audio)
    mel = mel_spectrogram(jnp.asarray(audio.numpy()))
    np.testing.assert_allclose(np.asarray(mel).transpose(0, 2, 1),
                               mel_ref.numpy(), rtol=1e-3, atol=2e-3)


def test_pallas_mel_matches_jnp_path():
    # interpreter mode on CPU; the same kernel code runs compiled on TPU
    from radtts_tpu.ops.pallas_mel import mel_spectrogram_pallas
    rng = np.random.default_rng(7)
    audio = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 9000)).astype(np.float32))
    ref = mel_spectrogram(audio)
    out = mel_spectrogram_pallas(audio, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_istft_roundtrip():
    torch.manual_seed(2)
    audio = (torch.rand(1, 4096) * 1.6 - 0.8).numpy()
    mag, phase = stft_magnitude_phase(jnp.asarray(audio), 1024, 256, 1024)
    rec = istft(mag, phase, 1024, 256, 1024)
    n = min(rec.shape[1], audio.shape[1])
    # interior samples reconstruct exactly; edges are window-attenuated
    np.testing.assert_allclose(np.asarray(rec)[:, 512:n - 512],
                               audio[:, 512:n - 512], atol=1e-3)


def test_denoiser_parity():
    torch.manual_seed(3)
    h = RefAttrDict(dict(H_SMALL))
    ref_gen = RefGenerator(h).eval()
    with torch.no_grad():
        ref_den = RefDenoiser(ref_gen, filter_length=1024, n_overlap=4,
                              win_length=1024)
    audio = torch.rand(1, 6000) * 1.2 - 0.6
    with torch.no_grad():
        out_ref = ref_den(audio, strength=0.02)

    params = hifigan_generator_from_torch(ref_gen.state_dict(), H_SMALL)
    den = denoiser_init(params)
    np.testing.assert_allclose(
        np.asarray(den["bias_spec"])[:, 0],
        ref_den.bias_spec[:, :, 0].numpy(), rtol=1e-3, atol=1e-4)
    out = denoiser_apply(den, jnp.asarray(audio.numpy()), strength=0.02)
    n = min(out.shape[-1], out_ref.shape[-1])
    np.testing.assert_allclose(np.asarray(out)[:, 256:n - 256],
                               out_ref[:, 0, 256:n - 256].numpy(), atol=2e-3)


def test_griffin_lim_reconstruction():
    import jax
    from radtts_tpu.ops.stft import griffin_lim
    t = np.arange(22050 // 2, dtype=np.float32)
    sig = (0.5 * np.sin(2 * np.pi * 440 * t / 22050)).astype(np.float32)
    mag, _ = stft_magnitude_phase(jnp.asarray(sig[None]), 1024, 256, 1024)
    def spec_err(n):
        rec = griffin_lim(jax.random.PRNGKey(0), mag, n_iters=n)
        mag2, _ = stft_magnitude_phase(rec, 1024, 256, 1024)
        mag2 = mag2[:, :mag.shape[1]]
        return float(jnp.linalg.norm(mag2 - mag) / jnp.linalg.norm(mag))

    # reference torch griffin_lim lands at ~0.14-0.18 on this input (random
    # initial phase makes GL non-monotone); check same convergence regime
    err0, err60 = spec_err(0), spec_err(60)
    assert err60 < 0.2, (err0, err60)
    assert err60 < 0.5 * err0, (err0, err60)


def test_gaussian_blur_parity():
    import math
    import jax
    import torch.nn.functional as F
    from hifigan_models import GaussianBlurAugmentation
    from radtts_tpu.models.hifigan import (gaussian_blur_augmentation,
                                           gaussian_blur_kernels)
    ks, sigmas = (5, 5), [0.2, 0.7, 1.3]
    ref = GaussianBlurAugmentation(ks, sigmas, p_blurring=1.0)
    ours = gaussian_blur_kernels(ks, sigmas)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.kernels[:, 0, 0].numpy(),
                               rtol=1e-5, atol=1e-6)

    torch.manual_seed(0)
    mel = torch.randn(2, 80, 23)
    # replicate reference forward with a fixed kernel index
    i = 1
    pad = (ks[0] - 1) // 2
    x = F.pad(mel[:, None], (pad, pad, pad, pad), mode="reflect")
    ref_out = F.conv2d(x, weight=ref.kernels[i])[:, 0]

    kern = ours[i][None, None]
    xj = jnp.pad(jnp.asarray(mel.numpy())[:, None],
                 ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        xj, kern, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-4, atol=1e-5)
    # p_blurring=0 is identity
    same = gaussian_blur_augmentation(jax.random.PRNGKey(0),
                                      jnp.asarray(mel.numpy()),
                                      p_blurring=0.0)
    np.testing.assert_array_equal(np.asarray(same), mel.numpy())


def test_denoiser_zero_strength_is_identity():
    """strength == 0 must short-circuit to the input (lax.cond runtime
    branch; strength stays a device scalar so serving never retraces) —
    and a traced scalar must flip the behavior without recompilation."""
    from radtts_tpu.models.hifigan import (denoiser_apply, denoiser_init,
                                           hifigan_generator_init)
    h = {"resblock": "1", "upsample_rates": [8, 8, 2, 2],
         "upsample_kernel_sizes": [16, 16, 4, 4],
         "upsample_initial_channel": 32,
         "resblock_kernel_sizes": [3, 7, 11],
         "resblock_dilation_sizes": [[1, 3, 5]] * 3}
    voc = hifigan_generator_init(jax.random.PRNGKey(0), h)
    den = denoiser_init(voc)
    # random-init vocoders have a near-zero bias spectrum; inflate it so
    # the strength > 0 branch visibly subtracts
    den = dict(den, bias_spec=den["bias_spec"] + 0.1)
    audio = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 8192)).astype(np.float32))

    f = jax.jit(lambda a, s: denoiser_apply(den, a, strength=s))
    np.testing.assert_array_equal(np.asarray(f(audio, jnp.float32(0.0))),
                                  np.asarray(audio))
    out = np.asarray(f(audio, jnp.float32(0.05)))
    assert np.isfinite(out).all()
    assert np.abs(out - np.asarray(audio)).max() > 1e-5
