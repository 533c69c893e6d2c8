"""Time-folded 1-D convolutions: pack F consecutive frames into channels so
narrow-channel convs run as wide MXU matmuls.

The HiFi-GAN MRF tail stages are C=64 and C=32 at very long T (reference
hifigan_models.py:83-148 run them as torch convs; here they are the RTF
bottleneck): a 32x32 matmul uses 32 of the MXU's 128 lanes on BOTH operand
axes, capping utilization at ~1/16 — measured ~14 TFLOP/s on a 394 TFLOP/s
chip. Folding F frames into channels (F*C = 128) turns each conv into a
block-banded conv over T/F frames with (M, F*C_in, F*C_out) weights. The
dense folded weights carry exact zero blocks, costing (span+F)/K_taps more
FLOPs, but the 16x utilization gain dominates (~3-6x ideal per conv).

Exactness: the folded conv computes the same products as the original (the
extra terms multiply exact zeros), so outputs match the unfolded conv to
XLA reduction-order rounding.

Derivation. y[t,co] = sum_j sum_ci w[j,ci,co] * x[t + j*d - pad, ci].
With t = u*F + p and o = p + j*d - pad = m*F + q (floor div/mod):
  Y[u, p*C+co] = sum_m sum_{q,ci} W[m][q*C+ci, p*C+co] * X[u+m, q*C+ci]
so W[m][qC+ci, pC+co] = w[j,ci,co], a regular stride-1 dilation-1 conv over
the folded axis with asymmetric padding (-m_lo, m_hi). Zero padding in
folded space is zero frames in the original space — identical semantics to
the original conv's (conceptually unbounded) zero padding.
"""

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHC", "HIO", "NHC")


def fold_conv_weights(w, b, pad, dilation, fold):
    """Fold (K, C_in, C_out) weights by factor `fold`.

    Returns (W, B, (pad_left, pad_right)): W is (M, fold*C_in, fold*C_out),
    B is (fold*C_out,) or None, and the padding is for the folded axis.
    Works eagerly (numpy-style precompute) and under jit (static loops).
    """
    K, c_in, c_out = w.shape
    F = int(fold)
    o_min = -pad
    o_max = (F - 1) + (K - 1) * dilation - pad
    m_lo, m_hi = o_min // F, o_max // F
    M = m_hi - m_lo + 1
    # build per-output-phase columns: for phase p the taps land at
    # o = p + j*d - pad, i.e. a stride-d comb in a length-(M*F) o-axis
    W = jnp.zeros((M * F, c_in, F, c_out), w.dtype)
    for p in range(F):
        start = p - pad - m_lo * F
        W = W.at[start:start + (K - 1) * dilation + 1:dilation, :, p, :].set(
            w)
    # (M*F, C_in, F, C_out) -> (M, F(q), C_in, F(p), C_out)
    W = W.reshape(M, F, c_in, F, c_out)
    W = W.reshape(M, F * c_in, F * c_out)
    B = None if b is None else jnp.tile(b, F)
    return W, B, (-m_lo, m_hi)


def folded_conv_apply(fw, fb, fpad, X):
    """X: (B, U, F*C_in) folded input; returns (B, U, F*C_out)."""
    y = lax.conv_general_dilated(
        X, fw.astype(X.dtype), window_strides=(1,), padding=[fpad],
        dimension_numbers=_DIMNUMS)
    if fb is not None:
        y = y + fb.astype(X.dtype)
    return y


def fold_transpose_conv_weights(w, b, stride, padding):
    """Phase-fold FLIPPED transpose-conv weights (the lhs-dilated
    formulation stored by models/hifigan.py: (K, C_in, C_out)) into a
    stride-1 conv over INPUT frames emitting all `stride` output phases
    as channels.

    y[a*s + r] = sum_j w[j]·x_dil[a*s + r + j - (K-1-pad)] with x_dil the
    zero-dilated input; only j ≡ (K-1-pad - r) (mod s) hit real frames, at
    input offset m = (r + j - (K-1-pad))/s. Scattering w[j] into
    W[m, :, r*C_out:...] gives Y[a, r*C_out+co] = (conv1(x, W))[a], and
    reshaping (T, s*C_out) -> (T*s, C_out) is the transpose conv's output
    exactly (row-major; no data movement). One dense (T, M*C_in) x
    (M*C_in, s*C_out) matmul replaces the lhs-dilated conv whose TPU
    emitter was measured at ~3 TFLOP/s on the 256->128 stage."""
    K, c_in, c_out = w.shape
    s = int(stride)
    base = K - 1 - padding
    entries = []
    for r in range(s):
        for j in range(K):
            num = r + j - base
            if num % s == 0:
                entries.append((num // s, r, j))
    m_lo = min(e[0] for e in entries)
    m_hi = max(e[0] for e in entries)
    M = m_hi - m_lo + 1
    W = jnp.zeros((M, c_in, s, c_out), w.dtype)
    for m, r, j in entries:
        W = W.at[m - m_lo, :, r, :].set(w[j])
    W = W.reshape(M, c_in, s * c_out)
    B = None if b is None else jnp.tile(b, s)
    return W, B, (-m_lo, m_hi)


def conv_transpose1d_matmul(params, x, stride, padding):
    """Drop-in replacement for models/hifigan.py conv_transpose1d_apply
    (same params layout), computed as one folded window matmul."""
    W, B, fpad = fold_transpose_conv_weights(
        params["w"], params.get("b"), stride, padding)
    y = lax.conv_general_dilated(
        x, W.astype(x.dtype), window_strides=(1,), padding=[fpad],
        dimension_numbers=_DIMNUMS)
    if B is not None:
        y = y + B.astype(x.dtype)
    Bsz, T, SC = y.shape
    return y.reshape(Bsz, T * stride, SC // stride)


def fold_time(x, fold):
    """(B, T, C) -> (B, T//fold, fold*C). Requires T % fold == 0."""
    B, T, C = x.shape
    return x.reshape(B, T // fold, fold * C)


def unfold_time(X, fold):
    """(B, U, fold*C) -> (B, U*fold, C)."""
    B, U, FC = X.shape
    return X.reshape(B, U * fold, FC // fold)


def _get_padding(kernel_size, dilation):
    return (kernel_size * dilation - dilation) // 2


def resblock1_apply_folded(block, X, kernel_size, dilations, fold,
                           lrelu_slope=0.1):
    """ResBlock1 (reference hifigan_models.py:83-123) in folded space.

    `block` holds the UNFOLDED conv params ({"w","b"} per conv); weights are
    folded inside the traced graph — a few MB of static scatter per call,
    negligible next to the conv work. leaky_relu and the residual adds are
    elementwise, so they commute with the fold reshape.
    """
    from radtts_tpu.ops.conv import effective_weight

    for c1, c2, d in zip(block["convs1"], block["convs2"], dilations):
        f1 = fold_conv_weights(effective_weight(c1), c1.get("b"),
                               _get_padding(kernel_size, d), d, fold)
        f2 = fold_conv_weights(effective_weight(c2), c2.get("b"),
                               _get_padding(kernel_size, 1), 1, fold)
        xt = jax.nn.leaky_relu(X, lrelu_slope)
        xt = folded_conv_apply(*f1, xt)
        xt = jax.nn.leaky_relu(xt, lrelu_slope)
        xt = folded_conv_apply(*f2, xt)
        X = xt + X
    return X
