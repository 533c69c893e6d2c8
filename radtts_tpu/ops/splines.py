"""Piecewise-linear and piecewise-quadratic monotone spline transforms for
normalizing-flow couplings (behavior parity with reference splines.py:37-319).

All functions are shape-polymorphic over leading dims, branch-free, and
jittable: boolean-mask compression in the reference (which produces dynamic
shapes) is replaced by where-selects, and bin lookup uses vectorized
comparisons instead of searchsorted.

x layout: (..., ) element-wise; bin parameters broadcast on the last axis.
"""

import jax
import jax.numpy as jnp
import numpy as np

_EPS32 = float(np.finfo(np.float32).eps)


def piecewise_linear_forward(x, q_tilde):
    """x: (N, k) in [0,1]; q_tilde: (N, k, b) unnormalized bin heights.
    Returns (y, log_j) with log_j summed over k (N,)."""
    from radtts_tpu.debug import check_finite
    x = check_finite(x, "piecewise_linear_forward bin input")
    b = q_tilde.shape[-1]
    w = 1.0 / b
    q = jax.nn.softmax(q_tilde, axis=-1) / w  # normalized slopes
    mx = jnp.clip(jnp.floor(b * x), 0, b - 1).astype(jnp.int32)
    alpha = x - mx * w
    slopes = jnp.take_along_axis(q, mx[..., None], axis=-1)[..., 0]
    out = alpha * slopes

    q_left = jnp.cumsum(q, axis=-1) * w
    q_left = jnp.concatenate(
        [jnp.zeros_like(q_left[..., :1]), q_left[..., :-1]], axis=-1)
    out = out + jnp.take_along_axis(q_left, mx[..., None], axis=-1)[..., 0]

    out = jnp.clip(out, _EPS32, 1.0 - _EPS32)
    oob = jnp.logical_or(x < 0.0, x > 1.0)
    out = jnp.where(oob, x, out)
    slopes = jnp.where(oob, 1.0, slopes)
    log_j = jnp.sum(jnp.log(slopes), axis=1)
    return out, log_j


def piecewise_linear_inverse(y, q_tilde):
    """Inverse of piecewise_linear_forward. Returns (x, log_j)."""
    from radtts_tpu.debug import check_finite
    y = check_finite(y, "piecewise_linear_inverse bin input")
    b = q_tilde.shape[-1]
    w = 1.0 / b
    q = jax.nn.softmax(q_tilde, axis=-1) / w
    q_left = jnp.cumsum(q, axis=-1) * w
    q_left = jnp.concatenate(
        [jnp.zeros_like(q_left[..., :1]), q_left[..., :-1]], axis=-1)

    edges_gap = y[..., None] - q_left
    edges_gap = jnp.where(edges_gap < 0, 2.0, edges_gap)
    edges = jnp.clip(jnp.argmin(edges_gap, axis=-1), 0, b - 1)

    qli = jnp.take_along_axis(q_left, edges[..., None], axis=-1)[..., 0]
    slope = jnp.take_along_axis(q, edges[..., None], axis=-1)[..., 0]

    x = (y - qli) / slope + edges * w
    x = jnp.clip(x, _EPS32, 1.0 - _EPS32)
    oob = jnp.logical_or(y < 0.0, y > 1.0)
    x = jnp.where(oob, y, x)
    slope = jnp.where(oob, 1.0, slope)
    log_j = -jnp.sum(jnp.log(slope), axis=1)
    return jax.lax.stop_gradient(x), log_j


def _weighted_softmax(v, w):
    v = v - jnp.max(v, axis=-1, keepdims=True)
    v = jnp.exp(v) + 1e-8
    v_sum = jnp.sum((v[..., :-1] + v[..., 1:]) / 2 * w, axis=-1, keepdims=True)
    return v / v_sum


def piecewise_quadratic(x, w_tilde, v_tilde, inverse=False):
    """Monotone quadratic spline on [0,1) (Neural Importance Sampling
    parametrization). x: (...,); w_tilde: (..., K); v_tilde: (..., K+1).
    Returns (y, log_j) (log_j is None for inverse)."""
    from radtts_tpu.debug import check_finite
    x = check_finite(x, "piecewise_quadratic bin input")
    eps = _EPS32
    w = jax.nn.softmax(w_tilde, axis=-1)
    v = _weighted_softmax(v_tilde, w)
    w_cumsum = jnp.cumsum(w, axis=-1)
    w_cumsum = w_cumsum.at[..., -1].set(1.0)
    w_cumsum_shift = jnp.pad(w_cumsum, [(0, 0)] * (w_cumsum.ndim - 1) + [(1, 0)])
    cdf = jnp.cumsum((v[..., 1:] + v[..., :-1]) / 2 * w, axis=-1)
    cdf = cdf.at[..., -1].set(1.0)
    cdf_shift = jnp.pad(cdf, [(0, 0)] * (cdf.ndim - 1) + [(1, 0)])

    K = w.shape[-1]
    ref = cdf if inverse else w_cumsum
    # torch.searchsorted(ref, x, right=False): first idx with ref[idx] >= x
    bin_index = jnp.sum(ref < x[..., None], axis=-1)
    bin_index = jnp.clip(bin_index, 0, K - 1)

    take = lambda a, i: jnp.take_along_axis(a, i[..., None], axis=-1)[..., 0]
    w_b = take(w, bin_index)
    w_bn1 = take(w_cumsum_shift, bin_index)
    v_b = take(v, bin_index)
    v_bp1 = take(v, bin_index + 1)
    cdf_bn1 = take(cdf_shift, bin_index)

    if not inverse:
        alpha = (x - w_bn1) / jnp.maximum(w_b, eps)
        c = (alpha ** 2) / 2 * (v_bp1 - v_b) * w_b + alpha * v_b * w_b + cdf_bn1
        log_j = jnp.log(jnp.maximum(v_b + alpha * (v_bp1 - v_b), eps))
        c = jnp.clip(c, eps, 1.0 - eps)
        return c, log_j
    else:
        a = (v_bp1 - v_b) * w_b / 2
        bb = v_b * w_b
        cc = cdf_bn1 - x
        disc = jnp.maximum(bb * bb - 4 * a * cc, 0.0)
        sqrt_disc = jnp.sqrt(disc)
        # larger quadratic root; fall back to the linear solution when a ~ 0
        alpha_quad = (-bb + sqrt_disc) / jnp.where(
            jnp.abs(a) < 1e-12, 1.0, 2 * a)
        alpha_lin = -cc / jnp.maximum(bb, eps)
        alpha = jnp.where(jnp.abs(a) < 1e-12, alpha_lin, alpha_quad)
        inv = alpha * w_b + w_bn1
        inv = jnp.clip(inv, eps, 1.0 - eps)
        return inv, None


def unbounded_piecewise_quadratic(x, w_tilde, v_tilde, upper=1.0, lower=0.0,
                                  inverse=False):
    """Identity outside [lower, upper); quadratic spline inside (reference:
    splines.py:221-245). Returns (y, log_j); log_j is None for inverse."""
    _range = upper - lower
    inside = (x >= lower) & (x < upper)
    x_norm = jnp.clip((x - lower) / _range, 0.0, 1.0 - _EPS32)
    y_in, log_j_in = piecewise_quadratic(x_norm, w_tilde, v_tilde,
                                         inverse=inverse)
    y = jnp.where(inside, y_in * _range + lower, x)
    if inverse:
        return y, None
    log_j = jnp.where(inside, log_j_in, 0.0)
    return y, log_j
