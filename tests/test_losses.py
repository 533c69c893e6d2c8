"""Loss parity vs reference loss.py on matched model outputs."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.ref_utils import converge_spectral_norms, install_reference

install_reference()

from loss import AttentionBinarizationLoss, RADTTSLoss  # noqa: E402
from radtts import RADTTS as RefRADTTS  # noqa: E402

from radtts_tpu.convert import radtts_from_torch  # noqa: E402
from radtts_tpu.losses import (attention_binarization_loss,  # noqa: E402
                               radtts_loss)
from radtts_tpu.models.radtts import radtts_forward  # noqa: E402
from tests.small_model import MODEL_CONFIG, make_batch  # noqa: E402

LOSS_WEIGHTS = {
    "blank_logprob": -1,
    "ctc_loss_weight": 0.1,
    "binarization_loss_weight": 1.0,
    "dur_loss_weight": 1.0,
    "f0_loss_weight": 1.0,
    "energy_loss_weight": 1.0,
    "vpred_loss_weight": 1.0,
}


def _j(t):
    return jnp.asarray(t.numpy())


@pytest.fixture(scope="module")
def everything():
    torch.manual_seed(0)
    ref = RefRADTTS(**MODEL_CONFIG).eval()
    converge_spectral_norms(ref)
    params = radtts_from_torch(ref.state_dict(), MODEL_CONFIG)
    b = make_batch()
    with torch.no_grad():
        ref_out = ref(b["mel"], b["speaker_ids"], b["text"], b["in_lens"],
                      b["out_lens"], binarize_attention=True,
                      attn_prior=b["prior"], f0=b["f0"],
                      energy_avg=b["energy"], voiced_mask=b["voiced"])
    out = radtts_forward(
        params, _j(b["mel"].transpose(1, 2)), _j(b["speaker_ids"]),
        _j(b["text"]), _j(b["in_lens"]), _j(b["out_lens"]),
        binarize_attention_flag=True, attn_prior=_j(b["prior"]),
        f0=_j(b["f0"]), energy_avg=_j(b["energy"]),
        voiced_mask=_j(b["voiced"]))
    return ref, b, ref_out, out


def test_radtts_loss_parity(everything):
    ref, b, ref_out, out = everything
    criterion = RADTTSLoss(
        1.0, MODEL_CONFIG["n_group_size"], MODEL_CONFIG["dur_model_config"],
        MODEL_CONFIG["f0_model_config"],
        MODEL_CONFIG["energy_model_config"],
        vpred_model_config=MODEL_CONFIG["v_model_config"],
        loss_weights=LOSS_WEIGHTS)
    with torch.no_grad():
        ref_losses = criterion(ref_out, b["in_lens"], b["out_lens"])

    ours = radtts_loss(
        out, _j(b["in_lens"]), _j(b["out_lens"]), sigma=1.0,
        n_group_size=MODEL_CONFIG["n_group_size"],
        dur_model_config=MODEL_CONFIG["dur_model_config"],
        f0_model_config=MODEL_CONFIG["f0_model_config"],
        energy_model_config=MODEL_CONFIG["energy_model_config"],
        vpred_model_config=MODEL_CONFIG["v_model_config"],
        loss_weights=LOSS_WEIGHTS)

    assert set(ours.keys()) == set(ref_losses.keys())
    for k, (v_ref, w_ref) in ref_losses.items():
        v_ours, w_ours = ours[k]
        assert w_ours == w_ref, k
        np.testing.assert_allclose(float(v_ours), float(v_ref), rtol=2e-3,
                                   atol=2e-4, err_msg=k)


def test_binarization_loss_parity(everything):
    _, _, ref_out, out = everything
    ref_loss = AttentionBinarizationLoss()(ref_out["attn"],
                                           ref_out["attn_soft"])
    ours = attention_binarization_loss(out["attn"], out["attn_soft"])
    np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-3)
