"""FastPitch-style feed-forward transformer backbone for DAP (behavior
parity with reference transformer.py:21-199): sinusoidal positions, post-norm
multi-head self-attention with fused qkv, conv1d FFN."""

import math

import jax
import jax.numpy as jnp

from radtts_tpu.ops.conv import conv1d_apply, conv1d_init
from radtts_tpu.ops.linear import linear_apply, linear_init
from radtts_tpu.ops.masking import sequence_mask
from radtts_tpu.ops.norms import layer_norm_apply, layer_norm_init
from radtts_tpu.ops.static import static


def positional_embedding(T, demb, dtype=jnp.float32):
    inv_freq = 1.0 / (10000 ** (jnp.arange(0.0, demb, 2.0) / demb))
    pos = jnp.arange(T, dtype=dtype)
    sinusoid = pos[:, None] * inv_freq[None, :]
    return jnp.concatenate([jnp.sin(sinusoid), jnp.cos(sinusoid)], axis=1)


def _mha_init(key, n_head, d_model, d_head):
    k1, k2 = jax.random.split(key)
    return {
        "qkv": {"w": jax.random.normal(k1, (d_model, 3 * n_head * d_head))
                * math.sqrt(1.0 / d_model),
                "b": jnp.zeros((3 * n_head * d_head,))},
        "o": {"w": jax.random.normal(k2, (n_head * d_head, d_model))
              * math.sqrt(1.0 / (n_head * d_head))},
        "ln": layer_norm_init(d_model),
        "_meta": static(n_head=n_head, d_head=d_head),
    }


def _mha_apply(params, x, key_valid, *, training=False, dropout_rng=None,
               dropout=0.1, dropatt=0.1):
    meta = params["_meta"]
    H, Dh = meta["n_head"], meta["d_head"]
    B, T, _ = x.shape
    qkv = linear_apply(params["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, H, Dh)
    k = k.reshape(B, T, H, Dh)
    v = v.reshape(B, T, H, Dh)
    score = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
    score = score * (1.0 / math.sqrt(Dh))
    score = jnp.where(key_valid[:, None, None, :], score, -jnp.inf)
    prob = jax.nn.softmax(score, axis=-1)
    if training and dropout_rng is not None:
        dropout_rng, sub = jax.random.split(dropout_rng)
        keep = jax.random.bernoulli(sub, 1.0 - dropatt, prob.shape)
        prob = jnp.where(keep, prob / (1.0 - dropatt), 0.0)
    attn_vec = jnp.einsum("bhqk,bkhd->bqhd", prob, v)
    attn_vec = attn_vec.reshape(B, T, H * Dh)
    out = linear_apply(params["o"], attn_vec)
    if training and dropout_rng is not None:
        dropout_rng, sub = jax.random.split(dropout_rng)
        keep = jax.random.bernoulli(sub, 1.0 - dropout, out.shape)
        out = jnp.where(keep, out / (1.0 - dropout), 0.0)
    return layer_norm_apply(params["ln"], x + out)


def _conv_ff_init(key, d_model, d_inner, kernel_size):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv1d_init(k1, d_model, d_inner, kernel_size),
        "conv2": conv1d_init(k2, d_inner, d_model, kernel_size),
        "ln": layer_norm_init(d_model),
        "_meta": static(kernel_size=kernel_size),
    }


def _conv_ff_apply(params, x, *, training=False, dropout_rng=None,
                   dropout=0.1):
    k = params["_meta"]["kernel_size"]
    h = conv1d_apply(params["conv1"], x, padding=k // 2)
    h = jax.nn.relu(h)
    h = conv1d_apply(params["conv2"], h, padding=k // 2)
    if training and dropout_rng is not None:
        dropout_rng, sub = jax.random.split(dropout_rng)
        keep = jax.random.bernoulli(sub, 1.0 - dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    return layer_norm_apply(params["ln"], x + h)


def fft_init(key, in_dim, out_dim=1, n_layers=6, n_head=1, d_head=64,
             d_inner=1024, kernel_size=3, dropout=0.1, dropatt=0.1,
             dropemb=0.0, **_unused):
    layers = []
    for _ in range(n_layers):
        key, k1, k2 = jax.random.split(key, 3)
        layers.append({"attn": _mha_init(k1, n_head, in_dim, d_head),
                       "ff": _conv_ff_init(k2, in_dim, d_inner, kernel_size)})
    key, sub = jax.random.split(key)
    return {"layers": layers, "dense": linear_init(sub, in_dim, out_dim),
            "_meta": static(in_dim=in_dim, dropout=dropout, dropatt=dropatt,
                            dropemb=dropemb)}


def fft_apply(params, x, in_lens, *, training=False, dropout_rng=None):
    """x: (B, T, C); returns (B, T, out_dim)."""
    meta = params["_meta"]
    B, T, C = x.shape
    mask = sequence_mask(in_lens, T)
    mf = mask.astype(x.dtype)[:, :, None]
    pos = positional_embedding(T, meta["in_dim"], x.dtype)[None] * mf
    out = x + pos
    if training and dropout_rng is not None and meta["dropemb"] > 0:
        dropout_rng, sub = jax.random.split(dropout_rng)
        keep = jax.random.bernoulli(sub, 1.0 - meta["dropemb"], out.shape)
        out = jnp.where(keep, out / (1.0 - meta["dropemb"]), 0.0)
    for layer in params["layers"]:
        if dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
        else:
            sub = None
        out = _mha_apply(layer["attn"], out, mask, training=training,
                         dropout_rng=sub, dropout=meta["dropout"],
                         dropatt=meta["dropatt"])
        out = out * mf
        if dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
        out = _conv_ff_apply(layer["ff"], out, training=training,
                             dropout_rng=sub, dropout=meta["dropout"])
        out = out * mf
    return linear_apply(params["dense"], out)
