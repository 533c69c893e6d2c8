"""Parity of core ops vs the PyTorch reference building blocks, using
converted weights on random inputs (eval mode, fp32)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from radtts_tpu.convert import (bilstm_from_torch, conv1d_from_torch,
                                lstm_cell_from_torch)
from radtts_tpu.ops.conv import conv_norm_apply
from radtts_tpu.ops.lstm import bilstm_apply, lstm_apply
from radtts_tpu.ops.norms import (instance_norm_init,
                                  masked_instance_norm_apply)

from tests.ref_utils import install_reference

install_reference()

from common import ConvNorm  # noqa: E402  (reference)

RTOL, ATOL = 1e-5, 1e-5


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("use_partial,kernel,dilation", [
    (False, 5, 1), (True, 5, 1), (True, 5, 4), (True, 3, 2), (False, 1, 1),
])
def test_conv_norm_parity(use_partial, kernel, dilation):
    torch.manual_seed(0)
    B, T, C_in, C_out = 3, 37, 16, 24
    ref = ConvNorm(C_in, C_out, kernel_size=kernel, dilation=dilation,
                   use_partial_padding=use_partial).eval()
    x = torch.randn(B, C_in, T)
    lens = torch.tensor([37, 20, 5])
    mask_t = (torch.arange(T)[None] < lens[:, None]).float()[:, None]
    with torch.no_grad():
        y_ref = ref(x, mask_t if use_partial else None)

    params = conv1d_from_torch(ref.state_dict(), "conv")
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    mj = jnp.asarray(mask_t[:, 0].numpy()) if use_partial else None
    yj = conv_norm_apply(params, xj, kernel_size=kernel, dilation=dilation,
                         mask=mj, use_partial_padding=use_partial)
    np.testing.assert_allclose(
        _np(yj), y_ref.numpy().transpose(0, 2, 1), rtol=RTOL, atol=ATOL)


def test_partial_conv_no_mask_border_renorm():
    """PartialConv1d with mask=None still renormalizes windows overlapping
    the zero padding; verify our apply matches."""
    torch.manual_seed(1)
    ref = ConvNorm(8, 8, kernel_size=5, use_partial_padding=True).eval()
    x = torch.randn(2, 8, 19)
    with torch.no_grad():
        y_ref = ref(x, None)
    params = conv1d_from_torch(ref.state_dict(), "conv")
    yj = conv_norm_apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                         kernel_size=5, use_partial_padding=True)
    np.testing.assert_allclose(_np(yj), y_ref.numpy().transpose(0, 2, 1),
                               rtol=RTOL, atol=ATOL)


def test_lstm_parity_full_length():
    torch.manual_seed(2)
    B, T, D, H = 2, 11, 6, 5
    ref = torch.nn.LSTM(D, H, 1, batch_first=True)
    x = torch.randn(B, T, D)
    with torch.no_grad():
        y_ref, _ = ref(x)
    params = lstm_cell_from_torch(ref.state_dict(), "")
    # converter builds names like ".weight_ih_l0"; normalize prefix
    yj, _ = lstm_apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(_np(yj), y_ref.numpy(), rtol=RTOL, atol=ATOL)


def test_bilstm_packed_parity():
    torch.manual_seed(3)
    B, T, D, H = 3, 13, 6, 4
    ref = torch.nn.LSTM(D, H, 1, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, D)
    lens = torch.tensor([13, 7, 4])
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, lens, batch_first=True, enforce_sorted=False)
    with torch.no_grad():
        out, _ = ref(packed)
    y_ref, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=T)

    params = bilstm_from_torch(ref.state_dict(), "")
    yj = bilstm_apply(params, jnp.asarray(x.numpy()),
                      jnp.asarray(lens.numpy()))
    np.testing.assert_allclose(_np(yj), y_ref.numpy(), rtol=RTOL, atol=ATOL)


def test_spectral_norm_lstm_parity():
    torch.manual_seed(4)
    B, T, D, H = 2, 9, 6, 4
    ref = torch.nn.LSTM(D, H, 1, batch_first=True, bidirectional=True)
    ref = torch.nn.utils.spectral_norm(ref, "weight_hh_l0")
    ref = torch.nn.utils.spectral_norm(ref, "weight_hh_l0_reverse")
    ref.eval()  # eval: uses stored u/v without power iteration
    x = torch.randn(B, T, D)
    lens = torch.tensor([9, 6])
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, lens, batch_first=True, enforce_sorted=False)
    with torch.no_grad():
        out, _ = ref(packed)
    y_ref, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=T)

    params = bilstm_from_torch(ref.state_dict(), "", norm="spectral")
    yj = bilstm_apply(params, jnp.asarray(x.numpy()),
                      jnp.asarray(lens.numpy()))
    np.testing.assert_allclose(_np(yj), y_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_masked_instance_norm_matches_per_sample():
    torch.manual_seed(5)
    B, T, C = 3, 21, 8
    norm = torch.nn.InstanceNorm1d(C, affine=True)
    with torch.no_grad():
        norm.weight.normal_()
        norm.bias.normal_()
    x = torch.randn(B, C, T)
    lens = [21, 10, 3]
    ref = torch.zeros(B, C, T)
    with torch.no_grad():
        for b, L in enumerate(lens):
            ref[b, :, :L] = norm(x[b : b + 1, :, :L])[0]

    params = {"gamma": jnp.asarray(norm.weight.detach().numpy()),
              "beta": jnp.asarray(norm.bias.detach().numpy())}
    mask = jnp.arange(T)[None, :] < jnp.asarray(lens)[:, None]
    yj = masked_instance_norm_apply(params, jnp.asarray(
        x.numpy().transpose(0, 2, 1)), mask)
    np.testing.assert_allclose(_np(yj), ref.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-4)


def test_bilstm_multi_matches_separate():
    """M fused BiLSTMs (one scan) == M separate bilstm_apply calls."""
    import jax
    from radtts_tpu.ops.lstm import bilstm_apply_multi, bilstm_init

    key = jax.random.PRNGKey(11)
    k1, k2, k3, kx1, kx2 = jax.random.split(key, 5)
    B, T, D, H = 3, 17, 6, 4
    p1 = bilstm_init(k1, D, H)
    p2 = bilstm_init(k2, D, H, norm="spectral")
    x1 = jax.random.normal(kx1, (B, T, D))
    x2 = jax.random.normal(kx2, (B, T, D))
    lens = jnp.asarray([17, 9, 2])

    fused = bilstm_apply_multi([p1, p2], [x1, x2], lens)
    np.testing.assert_allclose(_np(fused[0]), _np(bilstm_apply(p1, x1, lens)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(_np(fused[1]), _np(bilstm_apply(p2, x2, lens)),
                               rtol=1e-6, atol=1e-6)
    # lengths=None path
    fused_n = bilstm_apply_multi([p1, p2], [x1, x2], None)
    np.testing.assert_allclose(_np(fused_n[1]), _np(bilstm_apply(p2, x2)),
                               rtol=1e-6, atol=1e-6)
