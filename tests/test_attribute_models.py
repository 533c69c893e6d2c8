"""BGAP (bipartite flow) and AGAP (autoregressive flow) attribute model
parity: forward (z, log_s) and inverse sampling with injected noise."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.ref_utils import install_reference

install_reference()

from attribute_prediction_model import AGAP as RefAGAP  # noqa: E402
from attribute_prediction_model import BGAP as RefBGAP  # noqa: E402

from radtts_tpu.convert import agap_from_torch, bgap_from_torch  # noqa
from radtts_tpu.models.attributes import (agap_forward, agap_infer,  # noqa
                                          agap_init, bgap_forward,
                                          bgap_infer, bgap_init)

BGAP_HPARAMS = {
    "n_in_dim": 1,
    "take_log_of_input": False,
    "n_speaker_dim": 8,
    "n_flows": 3,
    "n_group_size": 2,
    "n_layers": 2,
    "kernel_size": 5,
    "scaling_fn": "tanh",
    "with_dilation": True,
    "bottleneck_hparams": {"in_dim": 48, "reduction_factor": 16,
                           "norm": "weightnorm",
                           "non_linearity": "leakyrelu",
                           "use_partial_padding": True, "kernel_size": 1},
    "n_bins": 8,
    "use_quadratic": True,
    "n_spline_steps": 2,
    "n_channels": 32,
}

AGAP_HPARAMS = {
    "n_in_dim": 1,
    "n_group_size": 1,
    "take_log_of_input": False,
    "n_speaker_dim": 8,
    "n_flows": 2,
    "n_hidden": 24,
    "n_lstm_layers": 1,
    "scaling_fn": "tanh",
    "bottleneck_hparams": {"in_dim": 48, "reduction_factor": 16,
                           "norm": "weightnorm", "non_linearity": "relu"},
    "spline_flow_params": {"n_in_channels": 1, "n_context_dim": 24,
                           "n_layers": 2, "n_bins": 8,
                           "use_quadratic": True},
}


def _j(t):
    return jnp.asarray(t.numpy())


def test_bgap_parity():
    torch.manual_seed(0)
    ref = RefBGAP(**BGAP_HPARAMS).eval()
    B, T, C = 2, 24, 48
    txt_enc = torch.randn(B, C, T)
    spk = torch.randn(B, 8)
    x = (torch.rand(B, T) * 2 - 1).clamp(-0.9, 0.9)
    lens = torch.tensor([24, 16])
    with torch.no_grad():
        out_ref = ref(txt_enc, spk, x, lens)

    tmpl = bgap_init(jax.random.PRNGKey(0), BGAP_HPARAMS)
    params = bgap_from_torch(ref.state_dict(), "", tmpl)
    params["_kind"] = tmpl.get("_kind")
    out = bgap_forward(params, _j(txt_enc.transpose(1, 2)), _j(spk), _j(x),
                       _j(lens))
    np.testing.assert_allclose(np.asarray(out["z"]).transpose(0, 2, 1),
                               out_ref["z"].numpy(), rtol=1e-3, atol=1e-4)
    for ls, ls_ref in zip(out["log_s_list"], out_ref["log_s_list"]):
        np.testing.assert_allclose(np.asarray(ls).transpose(0, 2, 1),
                                   ls_ref.numpy(), rtol=1e-3, atol=1e-4)
    for ld, ld_ref in zip(out["log_det_W_list"],
                          out_ref["log_det_W_list"]):
        np.testing.assert_allclose(float(ld), float(ld_ref), rtol=1e-4,
                                   atol=1e-4)

    # inverse with injected z
    torch.manual_seed(1)
    z = torch.randn(B, 1, T) * 0.5
    with torch.no_grad():
        x_ref = ref.infer(z, txt_enc, spk, lens)
    x_hat = bgap_infer(params, _j(z.transpose(1, 2)),
                       _j(txt_enc.transpose(1, 2)), _j(spk), _j(lens))
    np.testing.assert_allclose(np.asarray(x_hat).transpose(0, 2, 1),
                               x_ref.numpy(), rtol=1e-3, atol=1e-3)


def test_agap_parity():
    torch.manual_seed(2)
    ref = RefAGAP(**AGAP_HPARAMS).eval()
    # the AR spline param predictor is zero-initialized; at exactly-uniform
    # bins the reference's quadratic-root inverse is 0/0 = NaN
    # (splines.py:311-314) — ours takes the linear limit. Perturb so both
    # compute the generic path.
    with torch.no_grad():
        for flow in ref.flows:
            step = flow if hasattr(flow, "spline_flow") else flow.ar_step
            step.spline_flow.param_predictor.last_layer.weight.normal_(
                0, 0.05)
            step.spline_flow.param_predictor.last_layer.bias.normal_(0, 0.05)
    B, T, C = 2, 14, 48
    txt_enc = torch.randn(B, C, T)
    spk = torch.randn(B, 8)
    x = (torch.rand(B, T) * 2 - 1).clamp(-0.9, 0.9)
    lens = torch.tensor([14, 9])
    with torch.no_grad():
        out_ref = ref(txt_enc, spk, x, lens)

    tmpl = agap_init(jax.random.PRNGKey(0), AGAP_HPARAMS)
    params = agap_from_torch(ref.state_dict(), "", tmpl)
    params["_kind"] = tmpl.get("_kind")
    out = agap_forward(params, _j(txt_enc.transpose(1, 2)), _j(spk), _j(x),
                       _j(lens))
    # padding frames differ by design: the reference's backward AR step
    # leaves transformed garbage beyond each length and returns log_s in the
    # flipped+rolled domain (autoregressive_flow.py:57-71); both are masked
    # by the loss, so compare the masked z and per-sample valid log_s sums.
    mask = (np.arange(T)[None, :] < lens.numpy()[:, None]).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(out["z"]).transpose(0, 2, 1) * mask[:, None, :],
        out_ref["z"].numpy() * mask[:, None, :], rtol=1e-3, atol=1e-4)
    for ls, ls_ref in zip(out["log_s_list"], out_ref["log_s_list"]):
        ours_sum = (np.asarray(ls).transpose(0, 2, 1)
                    * mask[:, None, :]).sum(axis=(1, 2))
        ref_sum = (ls_ref.numpy() * mask[:, None, :]).sum(axis=(1, 2))
        np.testing.assert_allclose(ours_sum, ref_sum, rtol=1e-3, atol=1e-3)

    # inverse (full-length, no lens at inference) with injected z
    torch.manual_seed(3)
    z = torch.randn(B, 1, T) * 0.5
    with torch.no_grad():
        x_ref = ref.infer(z.clone(), txt_enc, spk)
    x_hat = agap_infer(params, _j(z.transpose(1, 2)),
                       _j(txt_enc.transpose(1, 2)), _j(spk))
    np.testing.assert_allclose(np.asarray(x_hat).transpose(0, 2, 1),
                               x_ref.numpy(), rtol=1e-3, atol=1e-3)
