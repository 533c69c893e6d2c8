"""Linear layers (channels-last). LinearNorm equivalent of reference
common.py:108-118 (xavier-uniform with gain); DenseLayer equivalent of
common.py:157-168 (tanh MLP)."""

import jax
import jax.numpy as jnp

from radtts_tpu.ops.initializers import xavier_uniform, kaiming_uniform_bias


def linear_init(key, in_dim, out_dim, *, bias=True, gain_name="linear",
                dtype=jnp.float32):
    k_w, k_b = jax.random.split(key)
    params = {"w": xavier_uniform(k_w, (in_dim, out_dim), in_dim, out_dim,
                                  gain_name, dtype)}
    if bias:
        params["b"] = kaiming_uniform_bias(k_b, (out_dim,), in_dim, dtype)
    return params


def linear_apply(params, x):
    y = x @ params["w"].astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


def dense_layer_init(key, in_dim, sizes):
    params = []
    d = in_dim
    for s in sizes:
        key, sub = jax.random.split(key)
        params.append(linear_init(sub, d, s))
        d = s
    return {"layers": params}


def dense_layer_apply(params, x):
    for lp in params["layers"]:
        x = jnp.tanh(linear_apply(lp, x))
    return x
