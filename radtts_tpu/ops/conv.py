"""1-D convolutions, channels-last, with optional weight-norm factorization
and mask-renormalized ("partial") padding.

Design notes (TPU):
  * canonical activation layout is (B, T, C): the channel axis maps to TPU
    lanes and XLA lowers small-kernel 1-D convs to MXU matmuls.
  * kernels are stored (K, C_in, C_out) for dimension_numbers ('NHC','HIO',
    'NHC'); converting a torch Conv1d weight (C_out, C_in, K) is a transpose.
  * the reference's PartialConv1d (reference: partialconv1d.py:20-71)
    renormalizes each window by valid-sample count and re-zeroes padding; we
    reproduce that math with a second tiny conv over the mask, fused by XLA.
  * weight norm (torch ``nn.utils.weight_norm``, dim=0) is a param
    factorization w = g * v / ||v||, collapsed at apply time; checkpoints can
    also store collapsed weights for inference.
"""

import jax
import jax.numpy as jnp
from jax import lax

from radtts_tpu.ops.initializers import xavier_uniform, kaiming_uniform_bias

_DIMNUMS = ("NHC", "HIO", "NHC")


def conv1d_init(key, in_ch, out_ch, kernel_size, *, bias=True,
                gain_name="linear", use_weight_norm=False, zero_init=False,
                dtype=jnp.float32):
    """Initialize conv params. Weight stored (K, C_in, C_out)."""
    k_w, k_b = jax.random.split(key)
    fan_in = in_ch * kernel_size
    fan_out = out_ch * kernel_size
    if zero_init:
        w = jnp.zeros((kernel_size, in_ch, out_ch), dtype)
    else:
        w = xavier_uniform(k_w, (kernel_size, in_ch, out_ch), fan_in, fan_out,
                           gain_name, dtype)
    params = {}
    if use_weight_norm:
        # per-output-channel norm over (K, C_in), matching torch dim=0
        norm = jnp.sqrt(jnp.sum(w * w, axis=(0, 1)) + 0.0)
        params["v"] = w
        params["g"] = norm
    else:
        params["w"] = w
    if bias:
        params["b"] = (jnp.zeros((out_ch,), dtype) if zero_init
                       else kaiming_uniform_bias(k_b, (out_ch,), fan_in, dtype))
    return params


def effective_weight(params):
    if "v" in params:
        v = params["v"]
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True)) + 1e-30
        return params["g"][None, None, :] * v / norm
    return params["w"]


def _raw_conv(x, w, stride, padding, dilation):
    pet = None
    if w.dtype == jnp.bfloat16 and x.dtype == jnp.float32:
        # bf16-stored weights (ops/fold_norms.py): feed the MXU bf16
        # operands directly — the same truncation DEFAULT matmul precision
        # applies to fp32 operands — and accumulate/emit fp32. The weight
        # HBM reads halve. TPU-ONLY equivalence: on TPU at DEFAULT
        # precision the dot results match the fp32-stored weights (the MXU
        # truncates to bf16 either way; asserted bit-equal on chip by
        # scripts/ab_fold_bf16.py, CPU-side semantics pinned by
        # tests/test_bf16_weights.py); on CPU/GPU backends DEFAULT fp32
        # convs do NOT truncate, so this path changes results there.
        pet = x.dtype
        x = x.astype(w.dtype)
    return lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=_DIMNUMS,
        preferred_element_type=pet)


def conv1d_apply(params, x, *, stride=1, padding=0, dilation=1, mask=None,
                 partial=False):
    """Apply a conv. x: (B, T, C_in); mask: optional (B, T) {0,1} validity.

    partial=True reproduces PartialConv1d: windows are renormalized by
    kernel_size / (#valid samples in window); when mask is None an all-ones
    mask is used, which still renormalizes windows that overlap zero padding
    (the reference relies on this border behavior).
    """
    w = effective_weight(params)
    if w.dtype != x.dtype and not (w.dtype == jnp.bfloat16
                                   and x.dtype == jnp.float32):
        w = w.astype(x.dtype)   # AMP: weights follow bf16 activations
    b = params.get("b")

    if not partial:
        y = _raw_conv(x, w, stride, padding, dilation)
        if b is not None:
            y = y + b.astype(x.dtype)
        return y

    k = w.shape[0]
    if mask is None:
        m = jnp.ones((1, x.shape[1], 1), x.dtype)
        xm = x
    else:
        m = mask.astype(x.dtype)[:, :, None]
        xm = x * m
    ones_k = jnp.ones((k, 1, 1), x.dtype)
    window_counts = _raw_conv(m, ones_k, stride, padding, dilation)
    mask_ratio = k / (window_counts + 1e-6)
    update_mask = jnp.clip(window_counts, 0.0, 1.0)
    mask_ratio = mask_ratio * update_mask

    raw = _raw_conv(xm, w, stride, padding, dilation)  # bias not yet added
    if b is not None:
        bb = b.astype(x.dtype)[None, None, :]
        return (raw * mask_ratio + bb) * update_mask
    return raw * mask_ratio


def conv_norm_init(key, in_ch, out_ch, kernel_size=1, *, dilation=1, bias=True,
                   gain_name="linear", use_weight_norm=False,
                   dtype=jnp.float32):
    """ConvNorm equivalent (reference: common.py:121-154): xavier init with a
    gain, optional partial padding (an apply-time flag) and weight norm."""
    return conv1d_init(key, in_ch, out_ch, kernel_size, bias=bias,
                       gain_name=gain_name, use_weight_norm=use_weight_norm,
                       dtype=dtype)


def conv_norm_apply(params, x, *, kernel_size, dilation=1, stride=1, mask=None,
                    use_partial_padding=False, padding=None):
    """Same-padded conv with the reference's re-zeroing: if a mask is passed,
    the output is multiplied by it (reference: common.py:150-153)."""
    if padding is None:
        padding = int(dilation * (kernel_size - 1) / 2)
    y = conv1d_apply(params, x, stride=stride, padding=padding,
                     dilation=dilation, mask=mask, partial=use_partial_padding)
    if mask is not None:
        y = y * mask.astype(y.dtype)[:, :, None]
    return y
