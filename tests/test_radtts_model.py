"""Full-model parity: RADTTS training forward and inference vs the PyTorch
reference with converted weights and injected noise (reduced dims for CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_utils import converge_spectral_norms, install_reference

install_reference()

from radtts import RADTTS as RefRADTTS  # noqa: E402

from radtts_tpu.convert import radtts_from_torch  # noqa: E402
from radtts_tpu.models.radtts import (infer_durations, radtts_forward,  # noqa
                                      radtts_infer, radtts_init)

from tests.small_model import MODEL_CONFIG, make_batch, B, N, T  # noqa: E402




@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    ref = RefRADTTS(**MODEL_CONFIG).eval()
    converge_spectral_norms(ref)
    params = radtts_from_torch(ref.state_dict(), MODEL_CONFIG)
    return ref, params


@pytest.fixture(scope="module")
def batch():
    return make_batch()


def _j(t):
    return jnp.asarray(t.numpy())


def _run_both(models, batch, binarize):
    ref, params = models
    b = batch
    with torch.no_grad():
        ref_out = ref(b["mel"], b["speaker_ids"], b["text"], b["in_lens"],
                      b["out_lens"], binarize_attention=binarize,
                      attn_prior=b["prior"], f0=b["f0"],
                      energy_avg=b["energy"], voiced_mask=b["voiced"],
                      p_voiced=None)
    out = radtts_forward(
        params, _j(b["mel"].transpose(1, 2)), _j(b["speaker_ids"]),
        _j(b["text"]), _j(b["in_lens"]), _j(b["out_lens"]),
        binarize_attention_flag=binarize, attn_prior=_j(b["prior"]),
        f0=_j(b["f0"]), energy_avg=_j(b["energy"]),
        voiced_mask=_j(b["voiced"]))
    return ref_out, out


def _close(ours_btc, ref_bct, rtol=1e-3, atol=2e-4, transpose=True):
    a = np.asarray(ours_btc)
    bv = ref_bct.numpy()
    if transpose:
        a = a.transpose(0, 2, 1)
    np.testing.assert_allclose(a, bv, rtol=rtol, atol=atol)


@pytest.mark.parametrize("binarize", [False, True])
def test_forward_parity(models, batch, binarize):
    ref_out, out = _run_both(models, batch, binarize)

    _close(out["attn_soft"], ref_out["attn_soft"][:, 0], transpose=False)
    _close(out["attn_logprob"], ref_out["attn_logprob"][:, 0],
           transpose=False)
    if binarize:
        np.testing.assert_array_equal(
            np.asarray(out["attn"]), ref_out["attn"][:, 0].numpy())
    _close(out["z_mel"], ref_out["z_mel"])
    for ls_ref, ls in zip(ref_out["log_s_list"], out["log_s_list"]):
        _close(ls, ls_ref)
    for ld_ref, ld in zip(ref_out["log_det_W_list"],
                          out["log_det_W_list"]):
        np.testing.assert_allclose(float(ld), float(ld_ref), rtol=1e-4,
                                   atol=1e-4)

    for key in ("duration_model_outputs", "f0_model_outputs",
                "energy_model_outputs", "vpred_model_outputs"):
        _close(out[key]["x_hat"], ref_out[key]["x_hat"])
        if ref_out[key]["x"] is not None:
            x_ref = ref_out[key]["x"]
            x_ours = np.asarray(out[key]["x"])
            if x_ref.dim() == 2:
                np.testing.assert_allclose(x_ours, x_ref.numpy(), rtol=1e-3,
                                           atol=2e-4)
            else:
                np.testing.assert_allclose(x_ours.transpose(0, 2, 1),
                                           x_ref.numpy(), rtol=1e-3,
                                           atol=2e-4)


def test_infer_parity(models, batch):
    """Inject identical noise into both implementations and compare mels."""
    ref, params = models
    b = batch
    torch.manual_seed(3)
    # B=1 (reference inference contract); its torch.LongTensor(list-of-
    # tensors) call (radtts.py:575) needs a shim on modern torch
    speaker_id = torch.tensor([1])
    text = b["text"][:1]

    max_frames = 40
    g = MODEL_CONFIG["n_group_size"]
    n_mel = MODEL_CONFIG["n_mel_channels"]

    # fixed durations summing to max_frames so shapes match exactly
    dur = torch.zeros(1, N, dtype=torch.long)
    base = max_frames // N
    dur[:] = base
    dur[:, -1] += max_frames - base * N

    z_f0 = torch.randn(1, 1, max_frames) * 0.8
    z_energy = torch.randn(1, 1, max_frames) * 0.8
    residual = torch.randn(1, n_mel * g, max_frames // g) * 0.7

    class _FixedTensor(torch.Tensor):
        """The reference overwrites allocated noise tensors via .normal_()
        (radtts.py:559,607,622,655); make that a no-op so injected values
        survive."""
        def normal_(self):
            return self

    class _FixedNoise:
        """Replays prepared tensors for torch.cuda.FloatTensor calls.
        Ignores the requested shape: the reference hardcodes 80 mel channels
        in its residual constructor (radtts.py:652-653)."""
        def __init__(self, tensors):
            self.tensors = list(tensors)

        def __call__(self, *shape):
            t = self.tensors.pop(0).clone()
            return torch.Tensor._make_subclass(_FixedTensor, t)

    orig = torch.cuda.FloatTensor
    orig_lt = torch.LongTensor
    # infer calls: z_f0, z_energy, residual (dur is provided)
    torch.cuda.FloatTensor = _FixedNoise([z_f0 / 0.8, z_energy / 0.8,
                                          residual / 0.7])

    class _LongTensorShim:
        def __call__(self, x):
            if isinstance(x, list) and x and torch.is_tensor(x[0]):
                return torch.cat([t.reshape(-1) for t in x]).long()
            return orig_lt(x)

    torch.LongTensor = _LongTensorShim()
    try:
        with torch.no_grad():
            ref_out = ref.infer(speaker_id, text, sigma=0.7, sigma_f0=0.8,
                                sigma_energy=0.8, dur=dur.float())
    finally:
        torch.cuda.FloatTensor = orig
        torch.LongTensor = orig_lt

    out = radtts_infer(
        params, jax.random.PRNGKey(0), _j(speaker_id), _j(text), 0.7,
        max_frames, dur=_j(dur).astype(jnp.int32),
        z_f0=_j(z_f0.transpose(1, 2)), z_energy=_j(z_energy.transpose(1, 2)),
        residual=_j(residual.transpose(1, 2)))

    mel_ref = ref_out["mel"].numpy()
    mel_ours = np.asarray(out["mel"]).transpose(0, 2, 1)
    np.testing.assert_allclose(mel_ours, mel_ref, rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["f0"]),
                               ref_out["f0"].numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["energy_avg"]),
                               ref_out["energy_avg"].numpy(), rtol=1e-3,
                               atol=1e-4)


def test_infer_durations_runs(models):
    _, params = models
    text = jnp.asarray(np.random.default_rng(0).integers(1, 180, (1, N)))
    dur = infer_durations(params, jax.random.PRNGKey(1),
                          jnp.asarray([0]), text)
    assert dur.shape == (1, N)
    assert (np.asarray(dur) >= 0).all()


def test_infer_durations_grouped_model_pads_to_text_length():
    """A n_group_size=2 BGAP duration model emits N/2 tokens; inference
    must replication-pad back to (B, N) (reference: radtts.py:562-566)."""
    import copy

    from tests.test_attribute_models import BGAP_HPARAMS
    from radtts_tpu.models.radtts import infer_durations, radtts_init

    hp = copy.deepcopy(BGAP_HPARAMS)
    hp["bottleneck_hparams"]["in_dim"] = MODEL_CONFIG["n_text_dim"]
    hp["take_log_of_input"] = True
    cfg = dict(MODEL_CONFIG,
               dur_model_config={"name": "bgap", "hparams": hp})
    params = radtts_init(jax.random.PRNGKey(0), cfg)
    # odd N: the g=2 unfold truncates to 14 tokens, so the model emits 14
    # and inference must replication-pad the 15th
    text = jnp.asarray(np.random.default_rng(0).integers(1, 180, (2, 15)))
    dur = infer_durations(params, jax.random.PRNGKey(1),
                          jnp.asarray([0, 1]), text)
    assert dur.shape == (2, 15)
    d = np.asarray(dur)
    assert (d >= 0).all()
    # the padded tail replicates the last emitted prediction
    assert (d[:, -1] == d[:, -2]).all()


def test_f0_renormalization_single_item_reference_parity():
    """At B=1, per-item renorm equals the reference's boolean-mask indexing
    with Bessel correction (radtts.py:613-622)."""
    import torch

    from radtts_tpu.models.radtts import renormalize_f0

    r = np.random.default_rng(3)
    f0 = (r.random((1, 40)) * 300 + 80).astype(np.float32)
    vm = (r.random((1, 40)) > 0.4).astype(np.float32)
    f0 = f0 * vm
    f0_mean, f0_std = 180.0, 25.0

    t_f0 = torch.tensor(f0.copy())
    t_vm = torch.tensor(vm).bool()
    mu, sig = t_f0[t_vm].mean(), t_f0[t_vm].std()
    t_f0[t_vm] = (t_f0[t_vm] - mu) / sig
    t_f0[t_vm] = t_f0[t_vm] * f0_std + f0_mean

    ours = np.asarray(renormalize_f0(jnp.asarray(f0), jnp.asarray(vm),
                                     f0_mean, f0_std))
    np.testing.assert_allclose(ours, t_f0.numpy(), rtol=1e-5, atol=1e-4)

    # f0_std=0 -> keep source std (reference: f0_std if f0_std > 0 else sig)
    t2 = torch.tensor(f0.copy())
    t2[t_vm] = (t2[t_vm] - mu) / sig * sig + f0_mean
    ours2 = np.asarray(renormalize_f0(jnp.asarray(f0), jnp.asarray(vm),
                                      f0_mean, 0.0))
    np.testing.assert_allclose(ours2, t2.numpy(), rtol=1e-5, atol=1e-4)


def test_f0_renormalization_batched_equals_single_calls():
    """A padded batch of 2 renormalizes each item with ITS OWN voiced
    stats: rows must equal two independent single-item calls, including a
    padded row whose garbage tail frames are excluded via out_lens."""
    from radtts_tpu.models.radtts import renormalize_f0

    r = np.random.default_rng(7)
    T, lens = 48, np.asarray([48, 31])
    f0 = (r.random((2, T)) * 300 + 80).astype(np.float32)
    vm = (r.random((2, T)) > 0.35).astype(np.float32)
    # padding frames beyond item 1's length: voiced-mask predictor noise
    vm[1, lens[1]:] = 1.0
    f0 = f0 * vm
    f0_mean, f0_std = 180.0, 25.0

    batched = np.asarray(renormalize_f0(
        jnp.asarray(f0), jnp.asarray(vm), f0_mean, f0_std,
        out_lens=jnp.asarray(lens)))
    for i in range(2):
        single = np.asarray(renormalize_f0(
            jnp.asarray(f0[i:i + 1, :lens[i]]),
            jnp.asarray(vm[i:i + 1, :lens[i]]), f0_mean, f0_std))
        np.testing.assert_allclose(batched[i, :lens[i]], single[0],
                                   rtol=1e-5, atol=1e-4)

    # f0_std=0 keeps each item's own std
    batched0 = np.asarray(renormalize_f0(
        jnp.asarray(f0), jnp.asarray(vm), f0_mean, 0.0,
        out_lens=jnp.asarray(lens)))
    for i in range(2):
        single0 = np.asarray(renormalize_f0(
            jnp.asarray(f0[i:i + 1, :lens[i]]),
            jnp.asarray(vm[i:i + 1, :lens[i]]), f0_mean, 0.0))
        np.testing.assert_allclose(batched0[i, :lens[i]], single0[0],
                                   rtol=1e-5, atol=1e-4)
