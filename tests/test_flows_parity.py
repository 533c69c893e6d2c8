"""Flow primitives: parity vs reference layers (converted weights) plus
inverse(forward(x)) == x round trips."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from radtts_tpu.convert import (affine_coupling_from_torch,
                                inv1x1_from_torch, inv1x1_lus_from_torch,
                                spline_coupling_from_torch)
from radtts_tpu.models.coupling import (affine_coupling_apply,
                                        affine_coupling_init,
                                        spline_ar_apply, spline_ar_init,
                                        spline_coupling_apply,
                                        spline_coupling_init)
from radtts_tpu.ops.invertible import (inv1x1_forward, inv1x1_inverse,
                                       inv1x1_lus_forward, inv1x1_lus_init,
                                       inv1x1_lus_inverse, inv1x1_init)

from tests.ref_utils import install_reference

install_reference()

from common import (AffineTransformationLayer, Invertible1x1Conv,  # noqa
                    Invertible1x1ConvLUS, SplineTransformationLayer,
                    SplineTransformationLayerAR)


def _bct(x_btc):
    return np.asarray(x_btc).transpose(0, 2, 1)


def test_inv1x1_lus_parity_and_roundtrip():
    torch.manual_seed(0)
    C, B, T = 16, 2, 9
    ref = Invertible1x1ConvLUS(C).eval()
    x = torch.randn(B, C, T)
    with torch.no_grad():
        y_ref, logdet_ref = ref(x)

    params = inv1x1_lus_from_torch(ref.state_dict(), "")
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    yj, logdet = inv1x1_lus_forward(params, xj)
    np.testing.assert_allclose(_bct(yj), y_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(logdet), float(logdet_ref), rtol=1e-5,
                               atol=1e-5)

    xj_rt = inv1x1_lus_inverse(params, yj)
    np.testing.assert_allclose(np.asarray(xj_rt), np.asarray(xj), atol=1e-4)


def test_inv1x1_plain_parity():
    torch.manual_seed(1)
    C, B, T = 8, 2, 7
    ref = Invertible1x1Conv(C).eval()
    x = torch.randn(B, C, T)
    with torch.no_grad():
        y_ref, logdet_ref = ref(x)
    params = inv1x1_from_torch(ref.state_dict(), "")
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    yj, logdet = inv1x1_forward(params, xj)
    np.testing.assert_allclose(_bct(yj), y_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(logdet), float(logdet_ref), rtol=1e-4,
                               atol=1e-5)
    xj_rt = inv1x1_inverse(params, yj)
    np.testing.assert_allclose(np.asarray(xj_rt), np.asarray(xj), atol=1e-4)


@pytest.mark.parametrize("affine_model,scaling_fn", [
    ("wavenet", "tanh"), ("wavenet", "exp"), ("simple_conv", "tanh"),
])
def test_affine_coupling_parity(affine_model, scaling_fn):
    torch.manual_seed(2)
    B, T, C, CTX = 2, 12, 16, 10
    ref = AffineTransformationLayer(
        C, CTX, n_layers=2, affine_model=affine_model, scaling_fn=scaling_fn,
        n_channels=64, use_partial_padding=True).eval()
    # the reference ZERO-initializes the predictor's last conv
    # (common.py:540-542 WN.end, :499-501 SimpleConvNet.last_layer), which
    # makes a fresh coupling layer the identity-with-constant-scale
    # transform: parity on unperturbed weights never sees the WN /
    # ConvNet internals at all. Perturb the last layer so the whole
    # predictor stack contributes to the compared outputs.
    pred = ref.affine_param_predictor
    last = pred.end if hasattr(pred, "end") else pred.last_layer
    with torch.no_grad():
        last.weight.normal_(0, 0.05)
        last.bias.normal_(0, 0.05)
    z = torch.randn(B, C, T)
    ctx = torch.randn(B, CTX, T)
    lens = torch.tensor([12, 8])
    with torch.no_grad():
        y_ref, log_s_ref = ref(z, ctx, seq_lens=lens)

    tmpl = affine_coupling_init(
        jax.random.PRNGKey(0), C, CTX, 2, affine_model=affine_model,
        n_hidden=64, kernel_size=5)
    params = affine_coupling_from_torch(ref.state_dict(), "", tmpl)

    zj = jnp.asarray(z.numpy().transpose(0, 2, 1))
    cj = jnp.asarray(ctx.numpy().transpose(0, 2, 1))
    mask = jnp.arange(T)[None, :] < jnp.asarray(lens.numpy())[:, None]
    yj, log_sj = affine_coupling_apply(
        params, zj, cj, scaling_fn=scaling_fn, mask=mask,
        use_partial_padding=True)
    np.testing.assert_allclose(_bct(yj), y_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_bct(log_sj), log_s_ref.numpy(), rtol=1e-4,
                               atol=1e-5)

    # round trip
    zj_rt = affine_coupling_apply(
        params, yj, cj, scaling_fn=scaling_fn, mask=mask,
        use_partial_padding=True, inverse=True)
    np.testing.assert_allclose(np.asarray(zj_rt), np.asarray(zj), atol=1e-4)


@pytest.mark.parametrize("use_quadratic", [False, True])
def test_spline_coupling_parity(use_quadratic):
    torch.manual_seed(3)
    B, T, C, CTX = 2, 10, 8, 6
    ref = SplineTransformationLayer(
        C, CTX, n_layers=2, n_channels=32, n_bins=8, left=-3, right=3,
        bottom=-3, top=3, use_quadratic=use_quadratic).eval()
    z = torch.randn(B, C, T).clamp(-2.5, 2.5)
    ctx = torch.randn(B, CTX, T)
    lens = torch.tensor([10, 6])
    with torch.no_grad():
        y_ref, log_s_ref = ref(z, ctx, seq_lens=lens)

    tmpl = spline_coupling_init(
        jax.random.PRNGKey(0), C, CTX, 2, n_bins=8, left=-3, right=3,
        bottom=-3, top=3, use_quadratic=use_quadratic)
    params = spline_coupling_from_torch(ref.state_dict(), "", tmpl)

    zj = jnp.asarray(z.numpy().transpose(0, 2, 1))
    cj = jnp.asarray(ctx.numpy().transpose(0, 2, 1))
    mask = jnp.arange(T)[None, :] < jnp.asarray(lens.numpy())[:, None]
    yj, log_sj = spline_coupling_apply(params, zj, cj, mask=mask)
    np.testing.assert_allclose(_bct(yj), y_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_bct(log_sj), log_s_ref.numpy(), rtol=1e-4,
                               atol=2e-5)

    # round trip through our inverse (valid region only; the reference
    # clamps/eps-es inside the box so match loosely)
    zj_rt = spline_coupling_apply(params, yj, cj, mask=mask, inverse=True)
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(np.asarray(zj_rt) * valid,
                               np.asarray(zj) * valid, atol=2e-3)


@pytest.mark.parametrize("use_quadratic", [True, False])
def test_spline_ar_parity(use_quadratic):
    torch.manual_seed(4)
    B, T, C, CTX = 2, 9, 2, 12
    ref = SplineTransformationLayerAR(
        C, CTX, n_layers=2, n_channels=16, n_bins=8, left=-6, right=6,
        bottom=-6, top=6, use_quadratic=use_quadratic).eval()
    # the AR layer's param predictor is zero-initialized too
    # (common.py:605-607): perturb so the ConvNet internals are actually
    # compared (an all-zero prediction is the near-identity spline)
    with torch.no_grad():
        ref.param_predictor.last_layer.weight.normal_(0, 0.05)
        ref.param_predictor.last_layer.bias.normal_(0, 0.05)
    z = torch.randn(B, C, T).clamp(-5, 5)
    ctx = torch.randn(B, CTX, T)
    with torch.no_grad():
        y_ref, log_s_ref = ref(z, ctx, inverse=False)

    tmpl = spline_ar_init(jax.random.PRNGKey(0), C, CTX, 2, n_bins=8,
                          use_quadratic=use_quadratic)
    from radtts_tpu.convert import simple_convnet_from_torch
    params = {"pred": simple_convnet_from_torch(
        ref.state_dict(), "param_predictor", tmpl["pred"]["_meta"]),
        "_meta": tmpl["_meta"]}

    zj = jnp.asarray(z.numpy().transpose(0, 2, 1))
    cj = jnp.asarray(ctx.numpy().transpose(0, 2, 1))
    yj, log_sj = spline_ar_apply(params, zj, cj)
    np.testing.assert_allclose(_bct(yj), y_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_bct(log_sj), log_s_ref.numpy(), rtol=1e-4,
                               atol=2e-5)
