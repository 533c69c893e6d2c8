"""Text encoder: 3x [partial-padded conv -> masked InstanceNorm -> ReLU ->
dropout] -> masked BiLSTM (behavior parity with reference common.py:305-384).

The reference runs the conv stack in a per-sample Python loop over sliced
sequences and a packed BiLSTM; here both are single batched masked ops.
"""

import jax
import jax.numpy as jnp

from radtts_tpu.ops.conv import conv_norm_init, conv_norm_apply
from radtts_tpu.ops.lstm import bilstm_init, bilstm_apply
from radtts_tpu.ops.masking import sequence_mask
from radtts_tpu.ops.norms import instance_norm_init, masked_instance_norm_apply
from radtts_tpu.ops.static import static

KERNEL_SIZE = 5
DROPOUT_P = 0.5


def encoder_init(key, encoder_embedding_dim=512, encoder_n_convolutions=3,
                 lstm_norm=None):
    convs, norms = [], []
    for _ in range(encoder_n_convolutions):
        key, sub = jax.random.split(key)
        convs.append(conv_norm_init(sub, encoder_embedding_dim,
                                    encoder_embedding_dim, KERNEL_SIZE,
                                    gain_name="relu"))
        norms.append(instance_norm_init(encoder_embedding_dim))
    key, sub = jax.random.split(key)
    lstm = bilstm_init(sub, encoder_embedding_dim,
                       encoder_embedding_dim // 2, norm=lstm_norm)
    return {"convs": convs, "norms": norms, "lstm": lstm,
            "_meta": static(n_convs=encoder_n_convolutions)}


def encoder_apply(params, x, in_lens=None, *, training=False, dropout_rng=None):
    """x: (B, N, C) text embeddings. in_lens None => inference path without
    masking (reference Encoder.infer, common.py:375-384).

    Runs at full fp32 matmul precision — the reference pins the whole
    encoder outside autocast (common.py:341 @amp.autocast(False)); on TPU
    the default bf16 pass in the BiLSTM scans drifts the text encoding
    enough to break downstream mel parity."""
    with jax.default_matmul_precision("highest"):
        return _encoder_apply(params, x, in_lens, training=training,
                              dropout_rng=dropout_rng)


def _encoder_apply(params, x, in_lens=None, *, training=False,
                   dropout_rng=None):
    B, N, _ = x.shape
    mask = None if in_lens is None else sequence_mask(in_lens, N)
    for conv_p, norm_p in zip(params["convs"], params["norms"]):
        x = conv_norm_apply(conv_p, x, kernel_size=KERNEL_SIZE, mask=mask,
                            use_partial_padding=True)
        if mask is None:
            # instance norm over the full (unmasked) length
            full = jnp.ones((B, N), bool)
            x = masked_instance_norm_apply(norm_p, x, full)
        else:
            x = masked_instance_norm_apply(norm_p, x, mask)
        x = jax.nn.relu(x)
        if training and dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - DROPOUT_P, x.shape)
            x = jnp.where(keep, x / (1.0 - DROPOUT_P), 0.0)
    return bilstm_apply(params["lstm"], x, in_lens)
