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


def test_padded_decode_with_f0_renorm_matches_exact(params):
    """--batch_size N + --f0_mean > 0: renormalization stats are per item
    (length-masked), so padded batched output equals the single call."""
    rng = np.random.default_rng(2)
    text = jnp.asarray(rng.integers(1, 100, (1, N)))
    spk = jnp.asarray([0])
    max_frames = 32
    dur = jnp.full((1, N), max_frames // N, jnp.int32)
    dur = dur.at[:, -1].add(max_frames - int(jnp.sum(dur)))
    key = jax.random.PRNGKey(11)

    kw = dict(sigma_f0=1.0, sigma_energy=1.0, f0_mean=180.0, f0_std=25.0)
    out = radtts_infer(params, key, spk, text, 0.8, max_frames, dur=dur,
                       **kw)
    text_p = jnp.concatenate(
        [text, jnp.zeros((1, PAD), text.dtype)], axis=1)
    dur_p = jnp.concatenate(
        [dur, jnp.zeros((1, PAD), dur.dtype)], axis=1)
    out_p = radtts_infer(params, key, spk, text_p, 0.8, max_frames,
                         dur=dur_p, in_lens=jnp.asarray([N]), **kw)
    np.testing.assert_allclose(np.asarray(out_p["mel"]),
                               np.asarray(out["mel"]), rtol=2e-5,
                               atol=2e-5)


def _perturb(tree, key, scale=0.05):
    """Add small noise to every leaf (zero-init output layers make flow
    transforms identity, which would let padded-vs-exact pass trivially)."""
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(treedef, [
        l + jax.random.normal(k, l.shape, l.dtype) * scale
        for k, l in zip(keys, leaves)])


def test_agap_infer_padded_matches_exact():
    """AGAP inference on a padded batch: back-step reversals must flip each
    item's valid prefix (reference back step autoregressive_flow.py:57-71),
    so per-item outputs equal the exact-length run."""
    from tests.test_attribute_models import AGAP_HPARAMS
    from radtts_tpu.models.attributes import agap_infer, agap_init

    hp = dict(AGAP_HPARAMS, n_flows=2)
    p = agap_init(jax.random.PRNGKey(0), hp)
    for i in range(len(p["flows"])):
        if "spline_flow" in p["flows"][i]:
            p["flows"][i]["spline_flow"] = _perturb(
                p["flows"][i]["spline_flow"], jax.random.PRNGKey(10 + i))

    B, T, Tp, C = 2, 14, 20, 48
    r = np.random.default_rng(3)
    lens = np.array([14, 9])
    txt = r.standard_normal((B, Tp, C)).astype(np.float32)
    # pipeline invariant: the masked encoder / regulate_length zero the
    # context past each length (ops/lstm.py bilstm output masking,
    # ops/length_regulator.py), so the bottleneck conv's zero padding at
    # the exact-run edge equals the padded run. z stays garbage past the
    # length to prove the flow masks it internally.
    txt *= (np.arange(Tp)[None, :, None] < lens[:, None, None])
    z = (r.standard_normal((B, Tp, 1)) * 0.5).astype(np.float32)
    spk = r.standard_normal((B, 8)).astype(np.float32)

    out_p = np.asarray(agap_infer(
        p, jnp.asarray(z), jnp.asarray(txt), jnp.asarray(spk),
        jnp.asarray(lens)))
    for b in range(B):
        L = int(lens[b])
        out_e = np.asarray(agap_infer(
            p, jnp.asarray(z[b:b + 1, :L]), jnp.asarray(txt[b:b + 1, :L]),
            jnp.asarray(spk[b:b + 1])))
        np.testing.assert_allclose(out_p[b, :L], out_e[0], rtol=1e-5,
                                   atol=1e-5, err_msg=f"item {b}")


def test_bgap_infer_padded_matches_exact():
    """BGAP inference with in_lens % n_group_size != 0: the masked coupling
    convs must keep the valid-prefix groups identical to the exact-length
    run (inference.py --batch_size contract for grouped attribute models)."""
    from tests.test_attribute_models import BGAP_HPARAMS
    from radtts_tpu.models.attributes import bgap_infer, bgap_init

    p = bgap_init(jax.random.PRNGKey(1), BGAP_HPARAMS)
    p["transforms"] = _perturb(p["transforms"], jax.random.PRNGKey(2))
    g = BGAP_HPARAMS["n_group_size"]

    B, Tp, C = 2, 24, 48
    lens = np.array([15, 9])  # both % g != 0
    assert all(l % g for l in lens)
    r = np.random.default_rng(4)
    txt = r.standard_normal((B, Tp, C)).astype(np.float32)
    # zero context past the lengths (pipeline invariant, see AGAP test);
    # z stays garbage to prove the coupling masks handle it
    txt *= (np.arange(Tp)[None, :, None] < lens[:, None, None])
    z = (r.standard_normal((B, Tp, 1)) * 0.5).astype(np.float32)
    spk = r.standard_normal((B, 8)).astype(np.float32)

    out_p = np.asarray(bgap_infer(
        p, jnp.asarray(z), jnp.asarray(txt), jnp.asarray(spk),
        jnp.asarray(lens)))
    for b in range(B):
        L = int(lens[b])
        Lg = (L // g) * g  # the exact run computes L//g groups
        out_e = np.asarray(bgap_infer(
            p, jnp.asarray(z[b:b + 1, :L]), jnp.asarray(txt[b:b + 1, :L]),
            jnp.asarray(spk[b:b + 1]), jnp.asarray([L])))
        np.testing.assert_allclose(out_p[b, :Lg], out_e[0, :Lg], rtol=1e-4,
                                   atol=1e-5, err_msg=f"item {b}")


def test_grouped_duration_padded_matches_exact():
    """Grouped (BGAP) duration predictor through infer_durations on a
    padded batch with in_lens % g != 0: tokens past the last full group
    must replicate the exact run's ReplicationPad1d values, not be computed
    from pad-contaminated groups."""
    from tests.test_attribute_models import BGAP_HPARAMS

    dur_cfg = {"name": "bgap", "hparams": dict(
        BGAP_HPARAMS, take_log_of_input=True,
        bottleneck_hparams=dict(BGAP_HPARAMS["bottleneck_hparams"],
                                in_dim=MODEL_CONFIG["n_text_dim"]))}
    cfg = dict(MODEL_CONFIG, dur_model_config=dur_cfg)
    p = radtts_init(jax.random.PRNGKey(0), cfg)
    p["dur_pred_layer"]["transforms"] = _perturb(
        p["dur_pred_layer"]["transforms"], jax.random.PRNGKey(5))
    g = BGAP_HPARAMS["n_group_size"]

    Ne, Np = 15, 24
    assert Ne % g != 0
    r = np.random.default_rng(6)
    text = r.integers(1, 100, (1, Ne))
    text_p = np.zeros((1, Np), text.dtype)
    text_p[:, :Ne] = text
    z = (r.standard_normal((1, Np, 1)) * 0.5).astype(np.float32)
    spk = jnp.asarray([0])
    key = jax.random.PRNGKey(11)

    dur_e = infer_durations(p, key, spk, jnp.asarray(text),
                            z_dur=jnp.asarray(z[:, :Ne]))
    dur_p = infer_durations(p, key, spk, jnp.asarray(text_p),
                            in_lens=jnp.asarray([Ne]),
                            z_dur=jnp.asarray(z))
    np.testing.assert_array_equal(np.asarray(dur_p[:, :Ne]),
                                  np.asarray(dur_e))
    assert (np.asarray(dur_p[:, Ne:]) == 0).all()


@pytest.mark.slow
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
