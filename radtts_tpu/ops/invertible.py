"""Invertible 1x1 "convolutions" (channel-mixing matmuls) for flow steps.

Channels-last: a 1x1 conv is a single (C, C) matmul on the last axis, which
XLA maps straight onto the MXU. Two parametrizations, as in the reference:

  * LUS (reference: common.py:387-429): W = P @ L @ U with P a fixed
    permutation-ish orthogonal factor, L unit-lower-triangular, U upper;
    logdet = sum(log|diag(U)|).
  * plain (reference: common.py:431-472): free W, logdet via slogdet.

Instead of the reference's mutable `W_inverse` attribute caching, inference
code calls `precompute_inverses` once to add 'w_inv' entries to the params
pytree (pure function).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg


def _random_orthonormal(key, c):
    w = jax.random.normal(key, (c, c))
    q, _ = jnp.linalg.qr(w)
    det = jnp.linalg.det(q)
    q = q.at[:, 0].multiply(jnp.where(det < 0, -1.0, 1.0))
    return q


def inv1x1_lus_init(key, c):
    W = _random_orthonormal(key, c)
    if isinstance(W, jax.core.Tracer):
        # Traced path (init itself under jit, e.g. bench.py's on-device
        # init program): jax's LU instead of scipy's. fp32 instead of the
        # host path's fp64 factorization — irrelevant for a random init.
        p_piv, l, u = jax.scipy.linalg.lu(W.astype(jnp.float32))
        return {
            "p": p_piv,
            "lower": jnp.tril(l, -1),
            "upper": jnp.triu(u, 1),
            "upper_diag": jnp.diagonal(u),
        }
    W = np.asarray(W, dtype=np.float64)
    p, l, u = scipy.linalg.lu(W)
    return {
        "p": jnp.asarray(p, jnp.float32),            # fixed buffer
        "lower": jnp.asarray(np.tril(l, -1), jnp.float32),
        "upper": jnp.asarray(np.triu(u, 1), jnp.float32),
        "upper_diag": jnp.asarray(np.diag(u), jnp.float32),
    }


def inv1x1_lus_weight(params):
    c = params["lower"].shape[0]
    L = jnp.tril(params["lower"], -1) + jnp.eye(c, dtype=params["lower"].dtype)
    U = jnp.triu(params["upper"], 1) + jnp.diag(params["upper_diag"])
    return params["p"] @ (L @ U)


def inv1x1_lus_forward(params, x):
    """x: (B, T, C) -> (y, log_det_W scalar). Full-fp32 matmul: the
    reference runs these under autocast(False) (common.py:407); on TPU the
    default bf16 matmul pass here compounds through the 8-step flow stack
    and breaks the mel-MAE<1e-3 parity target."""
    W = inv1x1_lus_weight(params)
    hi = jax.lax.Precision.HIGHEST
    y = jnp.matmul(x, W.T.astype(x.dtype), precision=hi)
    log_det = jnp.sum(jnp.log(jnp.abs(params["upper_diag"])))
    return y, log_det


def inv1x1_lus_inverse(params, x):
    W_inv = params.get("w_inv")
    if W_inv is None:
        W_inv = jnp.linalg.inv(inv1x1_lus_weight(params))
    return jnp.matmul(x, W_inv.T.astype(x.dtype),
                      precision=jax.lax.Precision.HIGHEST)


def inv1x1_init(key, c):
    return {"w1x1": _random_orthonormal(key, c)}


def inv1x1_forward(params, x):
    W = params["w1x1"]
    y = jnp.matmul(x, W.T.astype(x.dtype),
                   precision=jax.lax.Precision.HIGHEST)
    sign, logabsdet = jnp.linalg.slogdet(W)
    # reference uses torch.logdet (nan for negative det); init guarantees
    # det > 0 so log|det| matches
    return y, logabsdet


def inv1x1_inverse(params, x):
    W_inv = params.get("w_inv")
    if W_inv is None:
        W_inv = jnp.linalg.inv(params["w1x1"])
    return jnp.matmul(x, W_inv.T.astype(x.dtype),
                      precision=jax.lax.Precision.HIGHEST)


@jax.jit
def precompute_inverses(params):
    """Tree-walk: add 'w_inv' next to every invertible-1x1 param group
    (replaces the reference's mutable W_inverse caching, common.py:413-423).
    Jitted: one compiled program instead of per-op dispatch (matters when
    the device sits behind a network tunnel)."""
    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            if "upper_diag" in node:
                out["w_inv"] = jnp.linalg.inv(inv1x1_lus_weight(node))
            elif "w1x1" in node:
                out["w_inv"] = jnp.linalg.inv(node["w1x1"])
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node
    return walk(params)
