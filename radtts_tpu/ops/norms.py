"""Normalization layers.

masked_instance_norm reproduces the reference text encoder's per-sample
InstanceNorm1d-over-valid-frames semantics (reference: common.py:305-384 runs
convs+norm on length-sliced sequences) as one batched masked op — no
per-sample Python loop.
"""

import jax.numpy as jnp


def instance_norm_init(num_channels):
    return {"gamma": jnp.ones((num_channels,)),
            "beta": jnp.zeros((num_channels,))}


def masked_instance_norm_apply(params, x, mask, eps=1e-5):
    """x: (B, T, C); mask: (B, T) validity. Stats over valid frames only;
    invalid frames are zeroed on output."""
    m = mask.astype(x.dtype)[:, :, None]
    count = jnp.sum(m, axis=1, keepdims=True)
    mean = jnp.sum(x * m, axis=1, keepdims=True) / count
    var = jnp.sum(jnp.square(x - mean) * m, axis=1, keepdims=True) / count
    y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * params["gamma"].astype(x.dtype) + params["beta"].astype(x.dtype)
    return y * m


def layer_norm_init(dim):
    return {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}


def layer_norm_apply(params, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return y * params["gamma"].astype(x.dtype) + params["beta"].astype(x.dtype)
