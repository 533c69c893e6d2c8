"""Parity for MAS, length regulator, text encoder, ConvAttention."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from radtts_tpu.convert import conv_attention_from_torch, encoder_from_torch
from radtts_tpu.models.attention import conv_attention_apply
from radtts_tpu.models.encoder import encoder_apply
from radtts_tpu.ops.length_regulator import regulate_length
from radtts_tpu.ops.mas import mas_width1

from tests.ref_utils import install_reference

install_reference()

from alignment import mas_width1 as ref_mas  # noqa: E402
from common import ConvAttention, Encoder, LengthRegulator  # noqa: E402


def test_mas_parity_batched_padded():
    rng = np.random.default_rng(0)
    B, T_mel, T_text = 4, 57, 19
    out_lens = np.array([57, 40, 23, 9])
    in_lens = np.array([19, 12, 7, 3])
    attn = rng.random((B, T_mel, T_text)).astype(np.float32) + 1e-3
    attn = attn / attn.sum(-1, keepdims=True)

    ref = np.zeros_like(attn)
    for b in range(B):
        ref[b, :out_lens[b], :in_lens[b]] = ref_mas(
            attn[b, :out_lens[b], :in_lens[b]].astype(np.float64))

    ours = np.asarray(mas_width1(jnp.asarray(attn), jnp.asarray(out_lens),
                                 jnp.asarray(in_lens)))
    np.testing.assert_array_equal(ours, ref)


def test_length_regulator_parity():
    torch.manual_seed(0)
    B, N, C = 3, 7, 5
    x = torch.randn(B, N, C)
    dur = torch.tensor([[2, 0, 3, 1, 4, 0, 2],
                        [1, 1, 1, 0, 0, 0, 0],
                        [5, 2, 0, 0, 1, 1, 1]])
    ref = LengthRegulator()
    with torch.no_grad():
        y_ref = ref(x, dur)
    T = y_ref.shape[1]
    y = regulate_length(jnp.asarray(x.numpy()), jnp.asarray(dur.numpy()), T)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-6)


def test_encoder_parity():
    torch.manual_seed(1)
    B, N, C = 3, 15, 32
    ref = Encoder(encoder_n_convolutions=2, encoder_embedding_dim=C,
                  norm_fn=torch.nn.InstanceNorm1d,
                  lstm_norm_fn="spectral").eval()
    x = torch.randn(B, C, N)
    lens = torch.tensor([15, 9, 4])
    with torch.no_grad():
        y_ref = ref(x, lens)  # (B, N, C)

    params = encoder_from_torch(ref.state_dict(), "", n_convs=2,
                                lstm_norm="spectral")
    y = encoder_apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                      jnp.asarray(lens.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), rtol=1e-3,
                               atol=5e-5)

    # infer path (no lengths)
    with torch.no_grad():
        y_ref_inf = ref.infer(x)
    y_inf = encoder_apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y_inf), y_ref_inf.numpy(),
                               rtol=1e-3, atol=5e-5)


def test_conv_attention_parity():
    torch.manual_seed(2)
    B, T_mel, T_text = 2, 23, 11
    n_mel, n_text = 16, 24
    ref = ConvAttention(n_mel, n_text).eval()
    mel = torch.randn(B, n_mel, T_mel)
    text_emb = torch.randn(B, n_text, T_text)
    in_lens = torch.tensor([11, 6])
    out_lens = torch.tensor([23, 15])
    prior = torch.rand(B, T_mel, T_text)

    mask = (torch.arange(T_text)[None] < in_lens[:, None])[..., None] == 0
    with torch.no_grad():
        attn_ref, logprob_ref = ref(mel, text_emb, out_lens, mask,
                                    key_lens=in_lens, attn_prior=prior)

    params = conv_attention_from_torch(ref.state_dict(), "")
    attn, logprob = conv_attention_apply(
        params, jnp.asarray(mel.numpy().transpose(0, 2, 1)),
        jnp.asarray(text_emb.numpy().transpose(0, 2, 1)),
        jnp.asarray(in_lens.numpy()), attn_prior=jnp.asarray(prior.numpy()))

    np.testing.assert_allclose(np.asarray(attn), attn_ref[:, 0].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logprob), logprob_ref[:, 0].numpy(),
                               rtol=1e-4, atol=1e-4)
