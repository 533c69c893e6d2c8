"""ConvAttention: Gaussian-isotropic text<->mel alignment attention (behavior
parity with reference common.py:835-924).

The O(T_mel * T_text * C) pairwise distance tensor of the reference is
expanded as |q|^2 + |k|^2 - 2 q.k so the cross term is a single MXU matmul.
"""

import jax
import jax.numpy as jnp

from radtts_tpu.ops.conv import conv_norm_init, conv_norm_apply
from radtts_tpu.ops.masking import sequence_mask

TEMPERATURE = 0.0005
EPS = 1e-8


def conv_attention_init(key, n_mel_channels=80, n_text_channels=512,
                        n_att_channels=80):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "key_proj": [
            conv_norm_init(k1, n_text_channels, n_text_channels * 2, 3,
                           gain_name="relu"),
            conv_norm_init(k2, n_text_channels * 2, n_att_channels, 1),
        ],
        "query_proj": [
            conv_norm_init(k3, n_mel_channels, n_mel_channels * 2, 3,
                           gain_name="relu"),
            conv_norm_init(k4, n_mel_channels * 2, n_mel_channels, 1),
            conv_norm_init(k5, n_mel_channels, n_att_channels, 1),
        ],
    }


def conv_attention_apply(params, queries, keys, in_lens, attn_prior=None):
    """queries: (B, T_mel, n_mel) mel; keys: (B, T_text, C_text) embeddings.
    Returns (attn (B, T_mel, T_text) softmaxed over text, attn_logprob)."""
    kp = params["key_proj"]
    k = conv_norm_apply(kp[0], keys, kernel_size=3)
    k = conv_norm_apply(kp[1], jax.nn.relu(k), kernel_size=1)

    qp = params["query_proj"]
    q = conv_norm_apply(qp[0], queries, kernel_size=3)
    q = conv_norm_apply(qp[1], jax.nn.relu(q), kernel_size=1)
    q = conv_norm_apply(qp[2], jax.nn.relu(q), kernel_size=1)

    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    # -temp * ||q_t - k_s||^2, cross term on the MXU
    q_sq = jnp.sum(q * q, axis=-1)[:, :, None]
    k_sq = jnp.sum(k * k, axis=-1)[:, None, :]
    cross = jnp.einsum("btc,bsc->bts", q, k,
                       preferred_element_type=jnp.float32)
    attn = -TEMPERATURE * (q_sq + k_sq - 2.0 * cross)

    if attn_prior is not None:
        attn = jax.nn.log_softmax(attn, axis=-1) + jnp.log(attn_prior + EPS)

    attn_logprob = attn

    key_mask = sequence_mask(in_lens, keys.shape[1])  # (B, T_text)
    attn = jnp.where(key_mask[:, None, :], attn, -jnp.inf)
    attn = jax.nn.softmax(attn, axis=-1)
    return attn, attn_logprob
