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


def test_trough_probs_match_scalar_loop():
    """The vectorized per-(frame,trough) probability pass must reproduce the
    librosa-style per-frame scipy loop (the pre-round-3 implementation) to
    float64 rounding."""
    import scipy.stats

    from radtts_tpu.data.pyin import _localmin, _trough_probs

    thresholds = np.linspace(0, 1, 101)
    beta_probs = np.diff(scipy.stats.beta.cdf(thresholds, 2, 18))
    bparam, ntp = 2, 0.01

    def scalar_loop(yin, trough_mask):
        yin_probs = np.zeros_like(yin)
        for i in range(yin.shape[0]):
            ti = np.flatnonzero(trough_mask[i])
            if ti.size == 0:
                continue
            th = yin[i, ti]
            tt = th[:, None] < thresholds[None, 1:]
            pos = np.cumsum(tt, axis=0) - 1
            n = np.count_nonzero(tt, axis=0)
            prior = scipy.stats.boltzmann.pmf(pos, bparam, n)
            prior[~tt] = 0
            probs = prior.dot(beta_probs)
            gm = int(np.argmin(th))
            probs[gm] += ntp * np.sum(
                beta_probs[:np.count_nonzero(~tt[gm])])
            yin_probs[i, ti] = probs
        return yin_probs

    for seed in range(3):
        rng = np.random.default_rng(seed)
        yin = np.abs(rng.standard_normal((37, 53))) * rng.uniform(0.1, 2)
        # include a frame with no troughs at all (monotone row)
        yin[5] = np.arange(53, 0, -1, dtype=np.float64)
        tm = _localmin(yin)
        assert not tm[5].any()
        got = _trough_probs(yin, tm, thresholds, beta_probs, bparam, ntp)
        want = scalar_loop(yin, tm)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-15)
