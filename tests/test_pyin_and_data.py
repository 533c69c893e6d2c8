"""pYIN pitch tracker behavior + beta-binomial prior parity."""

import numpy as np
import torch

from radtts_tpu.data.dataset import beta_binomial_prior_distribution
from radtts_tpu.data.pyin import pyin

from tests.ref_utils import install_reference

install_reference()

SR = 22050


def test_pyin_tracks_vibrato_sine_and_rejects_noise():
    t = np.arange(SR * 2) / SR
    f = 220 + 10 * np.sin(2 * np.pi * 3 * t)
    phase = np.cumsum(2 * np.pi * f / SR)
    y = 0.5 * np.sin(phase)
    rng = np.random.default_rng(0)
    y[int(0.8 * SR):int(1.2 * SR)] = 0.05 * rng.standard_normal(
        int(0.4 * SR))

    f0, voiced, p_voiced = pyin(y, 80, 640, sr=SR, frame_length=1024,
                                win_length=512, hop_length=256)
    tone = slice(20, 60)
    noise = slice(int(0.9 * SR / 256), int(1.1 * SR / 256))
    assert voiced[tone].all()
    assert abs(np.nanmedian(f0[tone]) - 220) < 10
    assert voiced[noise].mean() < 0.2
    assert (p_voiced >= 0).all() and (p_voiced <= 1).all()


def test_beta_binomial_prior_matches_reference():
    from data import beta_binomial_prior_distribution as ref_prior
    ours = beta_binomial_prior_distribution(17, 53, 1.0)
    ref = ref_prior(17, 53, 1.0).numpy()
    assert ours.shape == ref.shape == (53, 17)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)
