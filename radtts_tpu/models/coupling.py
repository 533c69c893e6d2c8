"""Coupling layers for the bipartite flows: parameter predictors (WN,
SimpleConvNet) and affine / spline transformation layers.

Behavior parity with reference common.py:475-832; layout is channels-last
(B, T, C) and channel splits are on the last axis. All couplings expose
forward (training, returns log_s) and inverse (sampling) as pure functions of
the same params.
"""

import math

import jax
import jax.numpy as jnp

from radtts_tpu.ops import amp
from radtts_tpu.ops.conv import conv1d_init, conv1d_apply, conv_norm_apply
from radtts_tpu.ops.static import static
from radtts_tpu.ops.splines import (piecewise_linear_forward,
                                    piecewise_linear_inverse,
                                    unbounded_piecewise_quadratic)

# ---------------------------------------------------------------------------
# scaling functions (reference: common.py:775-808, autoregressive_flow 129-145)
# ---------------------------------------------------------------------------


def scaling_and_log_s(scale_unconstrained, scaling_fn):
    if isinstance(scaling_fn, (list, tuple)):
        s_parts, log_parts = [], []
        for i, fn in enumerate(scaling_fn):
            s_i, log_i = scaling_and_log_s(
                scale_unconstrained[..., i:i + 1], fn)
            s_parts.append(s_i)
            log_parts.append(log_i)
        return (jnp.concatenate(s_parts, -1), jnp.concatenate(log_parts, -1))
    if scaling_fn == "translate":
        s = jnp.ones_like(scale_unconstrained)
        return s, jnp.zeros_like(scale_unconstrained)
    if scaling_fn == "exp":
        return jnp.exp(scale_unconstrained), scale_unconstrained
    if scaling_fn == "tanh":
        s = jnp.tanh(scale_unconstrained) + 1.0 + 1e-6
        return s, jnp.log(s)
    if scaling_fn == "sigmoid":
        s = jax.nn.sigmoid(scale_unconstrained + 10.0) + 1e-6
        return s, jnp.log(s)
    raise ValueError(f"scaling fn {scaling_fn} not supported")


# ---------------------------------------------------------------------------
# SimpleConvNet (reference: common.py:475-515)
# ---------------------------------------------------------------------------


def simple_convnet_init(key, n_in, n_context, final_out, n_layers=2,
                        kernel_size=5, with_dilation=True, max_channels=1024,
                        zero_init=True):
    layers = []
    in_ch = n_in + n_context
    meta = static(kernel_size=kernel_size, with_dilation=with_dilation,
                  n_layers=n_layers)
    for i in range(n_layers):
        key, sub = jax.random.split(key)
        out_ch = min(max_channels, in_ch * 2)
        layers.append(conv1d_init(sub, in_ch, out_ch, kernel_size,
                                  gain_name="relu"))
        in_ch = out_ch
    key, sub = jax.random.split(key)
    last = conv1d_init(sub, in_ch, final_out, 1, zero_init=zero_init)
    return {"layers": layers, "last": last, "_meta": meta}


def simple_convnet_apply(params, x, mask=None, use_partial_padding=True):
    meta = params["_meta"]
    k = meta["kernel_size"]
    x = amp.cast_in(x)
    for i, lp in enumerate(params["layers"]):
        dilation = 2 ** i if meta["with_dilation"] else 1
        x = conv_norm_apply(lp, x, kernel_size=k, dilation=dilation,
                            mask=mask, use_partial_padding=use_partial_padding)
        x = jax.nn.relu(x)
    return amp.cast_out(conv1d_apply(params["last"], x))


# ---------------------------------------------------------------------------
# WN (non-gated WaveNet param predictor; reference: common.py:518-578)
# ---------------------------------------------------------------------------


def wn_init(key, n_in, n_context, n_layers, n_channels, kernel_size=5):
    keys = jax.random.split(key, 2 + 2 * n_layers)
    start = conv1d_init(keys[0], n_in + n_context, n_channels, 1,
                        use_weight_norm=True)
    end = conv1d_init(keys[1], n_channels, 2 * n_in, 1, zero_init=True)
    in_layers, res_skip = [], []
    for i in range(n_layers):
        in_layers.append(conv1d_init(
            keys[2 + 2 * i], n_channels, n_channels, kernel_size,
            use_weight_norm=True))
        res_skip.append(conv1d_init(
            keys[3 + 2 * i], n_channels, n_channels, 1, use_weight_norm=True))
    return {"start": start, "end": end, "in_layers": in_layers,
            "res_skip": res_skip,
            "_meta": static(kernel_size=kernel_size, n_layers=n_layers)}


def wn_apply(params, z, context, mask=None, affine_activation="softplus",
             use_partial_padding=True):
    meta = params["_meta"]
    k = meta["kernel_size"]
    act = jax.nn.softplus if affine_activation == "softplus" else jax.nn.relu
    z = amp.cast_in(jnp.concatenate([z, context], axis=-1))
    z = conv1d_apply(params["start"], z)
    output = jnp.zeros_like(z)
    for i in range(meta["n_layers"]):
        dilation = 2 ** i
        z = act(conv_norm_apply(params["in_layers"][i], z, kernel_size=k,
                                dilation=dilation, mask=mask,
                                use_partial_padding=use_partial_padding))
        output = output + act(conv1d_apply(params["res_skip"][i], z))
    return amp.cast_out(conv1d_apply(params["end"], output))


# ---------------------------------------------------------------------------
# AffineTransformationLayer (reference: common.py:746-832)
# ---------------------------------------------------------------------------


def affine_coupling_init(key, n_channels_total, n_context, n_layers,
                         affine_model="wavenet", with_dilation=True,
                         kernel_size=5, n_hidden=1024):
    n_half = n_channels_total // 2
    if affine_model == "wavenet":
        pred = wn_init(key, n_half, n_context, n_layers, n_hidden,
                       kernel_size=5)
    elif affine_model == "simple_conv":
        pred = simple_convnet_init(key, n_half, n_context, n_channels_total,
                                   n_layers, kernel_size=kernel_size,
                                   with_dilation=with_dilation,
                                   zero_init=True)
    else:
        raise ValueError(f"{affine_model} affine model not supported")
    return {"pred": pred,
            "_meta": static(affine_model=affine_model,
                            n_channels=n_channels_total)}


def affine_coupling_apply(params, z, context, *, scaling_fn,
                          affine_activation="softplus", mask=None,
                          use_partial_padding=True, inverse=False):
    meta = params["_meta"]
    n_half = meta["n_channels"] // 2
    z0, z1 = z[..., :n_half], z[..., n_half:]
    if meta["affine_model"] == "wavenet":
        affine_params = wn_apply(params["pred"], z0, context, mask=mask,
                                 affine_activation=affine_activation,
                                 use_partial_padding=use_partial_padding)
    else:
        zc = jnp.concatenate([z0, context], axis=-1)
        affine_params = simple_convnet_apply(
            params["pred"], zc, mask=mask,
            use_partial_padding=use_partial_padding)

    scale_un = affine_params[..., :n_half]
    b = affine_params[..., n_half:]
    s, log_s = scaling_and_log_s(scale_un, scaling_fn)
    if inverse:
        z1 = (z1 - b) / s
        return jnp.concatenate([z0, z1], axis=-1)
    z1 = s * z1 + b
    return jnp.concatenate([z0, z1], axis=-1), log_s


# ---------------------------------------------------------------------------
# SplineTransformationLayer — coupling (reference: common.py:663-743)
# ---------------------------------------------------------------------------


def spline_coupling_init(key, n_channels_total, n_context, n_layers,
                         with_dilation=True, kernel_size=5, n_bins=8,
                         left=-4.0, right=4.0, bottom=-4.0, top=4.0,
                         use_quadratic=False):
    n_half = n_channels_total // 2
    eff_bins = 2 * n_bins + 1 if use_quadratic else n_bins
    pred = simple_convnet_init(key, n_half, n_context, n_half * eff_bins,
                               n_layers, kernel_size=kernel_size,
                               with_dilation=with_dilation, zero_init=False)
    return {"pred": pred,
            "_meta": static(n_channels=n_channels_total, n_bins=eff_bins,
                            left=left, right=right, bottom=bottom, top=top,
                            use_quadratic=use_quadratic)}


def spline_coupling_apply(params, z, context, mask=None, inverse=False):
    meta = params["_meta"]
    n_half = meta["n_channels"] // 2
    n_bins = meta["n_bins"]
    left, right = meta["left"], meta["right"]
    bottom, top = meta["bottom"], meta["top"]
    B, T, _ = z.shape

    z0, z1 = z[..., :n_half], z[..., n_half:]
    if inverse:
        z1 = (z1 - bottom) / (top - bottom)
    else:
        z1 = (z1 - left) / (right - left)

    zc = jnp.concatenate([z0, context], axis=-1)
    affine_params = simple_convnet_apply(params["pred"], zc, mask=mask)

    z1_flat = z1.reshape(B * T, n_half).astype(jnp.float32)
    q_tilde = affine_params.reshape(B * T, n_half, n_bins).astype(jnp.float32)

    if meta["use_quadratic"]:
        w = q_tilde[..., : n_bins // 2]
        v = q_tilde[..., n_bins // 2:]
        z1_tf, log_s = unbounded_piecewise_quadratic(
            z1_flat, w, v, inverse=inverse)
        if not inverse:
            log_s = jnp.sum(log_s, axis=1)
    else:
        if inverse:
            z1_tf, _ = piecewise_linear_inverse(z1_flat, q_tilde)
            log_s = None
        else:
            z1_tf, log_s = piecewise_linear_forward(z1_flat, q_tilde)

    z1 = z1_tf.reshape(B, T, n_half)
    if inverse:
        z1 = z1 * (right - left) + left
        return jnp.concatenate([z0, z1], axis=-1)
    z1 = z1 * (top - bottom) + bottom
    z = jnp.concatenate([z0, z1], axis=-1)
    log_s = log_s.reshape(B, T, 1) + n_half * (
        math.log(top - bottom) - math.log(right - left))
    return z, log_s


# ---------------------------------------------------------------------------
# SplineTransformationLayerAR — full-dim, context-only params (reference:
# common.py:582-660); used inside AGAP AR steps.
# ---------------------------------------------------------------------------


def spline_ar_init(key, n_in_channels, n_context_dim, n_layers, n_bins=8,
                   left=-6.0, right=6.0, bottom=-6.0, top=6.0,
                   use_quadratic=False):
    eff_bins = 2 * n_bins + 1 if use_quadratic else n_bins
    pred = simple_convnet_init(key, n_context_dim, 0,
                               n_in_channels * eff_bins, n_layers,
                               with_dilation=False, kernel_size=1,
                               zero_init=True)
    return {"pred": pred,
            "_meta": static(n_in=n_in_channels, n_bins=eff_bins, left=left,
                            right=right, bottom=bottom, top=top,
                            use_quadratic=use_quadratic)}


def spline_ar_apply(params, z, context, inverse=False):
    """z: (B, T, C_in); context: (B, T, C_ctx)."""
    meta = params["_meta"]
    c_s = meta["n_in"]
    n_bins = meta["n_bins"]
    left, right = meta["left"], meta["right"]
    bottom, top = meta["bottom"], meta["top"]
    B, T, _ = z.shape

    if inverse:
        z = (z - bottom) / (top - bottom)
    else:
        z = (z - left) / (right - left)

    affine_params = simple_convnet_apply(params["pred"], context, mask=None,
                                         use_partial_padding=False)
    z_flat = z.reshape(B * T, c_s).astype(jnp.float32)
    q_tilde = affine_params.reshape(B * T, c_s, n_bins).astype(jnp.float32)

    if meta["use_quadratic"]:
        w = q_tilde[..., : n_bins // 2]
        v = q_tilde[..., n_bins // 2:]
        z_tf, log_s = unbounded_piecewise_quadratic(z_flat, w, v,
                                                    inverse=inverse)
    else:
        if inverse:
            z_tf, log_s = piecewise_linear_inverse(z_flat, q_tilde)
        else:
            z_tf, log_s = piecewise_linear_forward(z_flat, q_tilde)

    z = z_tf.reshape(B, T, c_s)
    if inverse:
        z = z * (right - left) + left
        return z
    z = z * (top - bottom) + bottom
    if log_s.ndim == 1:  # linear spline sums over channels already
        log_s = log_s.reshape(B, T, 1)
    else:
        log_s = log_s.reshape(B, T, c_s)
    log_s = log_s + c_s * (math.log(top - bottom) - math.log(right - left))
    return z, log_s
