"""Batched inference over padded texts: the masked encoder path with
`in_lens` must reproduce the exact-length single-item path bit-for-bit
(pad tokens get duration 0 and contribute nothing downstream). This is the
contract behind inference.py --batch_size."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_utils import converge_spectral_norms, install_reference

install_reference()

from radtts import RADTTS as RefRADTTS  # noqa: E402

from radtts_tpu.convert import radtts_from_torch  # noqa: E402
from radtts_tpu.models.radtts import (infer_durations,  # noqa: E402
                                      radtts_infer, radtts_init)

from tests.small_model import MODEL_CONFIG, N  # noqa: E402

PAD = 8


@pytest.fixture(scope="module")
def params():
    torch.manual_seed(0)
    ref = RefRADTTS(**MODEL_CONFIG).eval()
    converge_spectral_norms(ref)
    return radtts_from_torch(ref.state_dict(), MODEL_CONFIG)


def test_padded_durations_match_exact(params):
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 100, (1, N)))
    spk = jnp.asarray([0])
    key = jax.random.PRNGKey(5)

    dur = infer_durations(params, key, spk, text)
    text_p = jnp.concatenate(
        [text, jnp.zeros((1, PAD), text.dtype)], axis=1)
    dur_p = infer_durations(params, key, spk, text_p,
                            in_lens=jnp.asarray([N]))
    # DAP ignores the z sample, so padded == exact on the valid prefix
    np.testing.assert_array_equal(np.asarray(dur_p[:, :N]),
                                  np.asarray(dur))
    assert (np.asarray(dur_p[:, N:]) == 0).all()


def test_padded_decode_matches_exact(params):
    rng = np.random.default_rng(1)
    text = jnp.asarray(rng.integers(1, 100, (1, N)))
    spk = jnp.asarray([0])
    g = MODEL_CONFIG["n_group_size"]
    max_frames = 32
    dur = jnp.full((1, N), max_frames // N, jnp.int32)
    dur = dur.at[:, -1].add(max_frames - int(jnp.sum(dur)))
    key = jax.random.PRNGKey(7)

    out = radtts_infer(params, key, spk, text, 0.8, max_frames, dur=dur,
                       sigma_f0=1.0, sigma_energy=1.0)
    text_p = jnp.concatenate(
        [text, jnp.zeros((1, PAD), text.dtype)], axis=1)
    dur_p = jnp.concatenate(
        [dur, jnp.zeros((1, PAD), dur.dtype)], axis=1)
    out_p = radtts_infer(params, key, spk, text_p, 0.8, max_frames,
                         dur=dur_p, sigma_f0=1.0, sigma_energy=1.0,
                         in_lens=jnp.asarray([N]))
    np.testing.assert_allclose(np.asarray(out_p["mel"]),
                               np.asarray(out["mel"]), rtol=2e-5,
                               atol=2e-5)


def test_two_item_batch_runs_and_masks(params):
    """B=2 with different lengths: both items produce finite mels and the
    shorter item's pad tokens contribute zero duration."""
    rng = np.random.default_rng(2)
    Np = N + PAD
    t_long = rng.integers(1, 100, (Np,))
    t_short = np.zeros((Np,), np.int64)
    t_short[:N] = rng.integers(1, 100, (N,))
    text = jnp.asarray(np.stack([t_long, t_short]))
    lens = jnp.asarray([Np, N])
    spk = jnp.asarray([0, 0])
    key = jax.random.PRNGKey(9)

    dur = infer_durations(params, key, spk, text, in_lens=lens)
    assert (np.asarray(dur[1, N:]) == 0).all()
    dur = dur + (jnp.sum(dur, axis=1, keepdims=True) < 1) * \
        (jnp.arange(Np)[None, :] < lens[:, None])
    max_frames = 32
    totals = jnp.sum(dur, axis=1)
    scale = jnp.minimum(1.0, max_frames / jnp.maximum(totals, 1))
    dur = jnp.floor(dur * scale[:, None]).astype(jnp.int32)
    out = radtts_infer(params, key, spk, text, 0.8, max_frames, dur=dur,
                       sigma_f0=1.0, sigma_energy=1.0, in_lens=lens)
    assert np.isfinite(np.asarray(out["mel"])).all()
