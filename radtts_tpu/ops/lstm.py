"""LSTM recurrences as `lax.scan`, with masking instead of packed sequences.

The reference leans on cuDNN LSTMs + pack_padded_sequence everywhere (text
encoder common.py:328-373, context LSTM radtts.py:147-163, ConvLSTMLinear
common.py:236-291, AGAP autoregressive_flow.py:93-127). On TPU we instead pad
to static shapes and mask: the forward direction freezes the carry past each
sequence's length; the backward direction gathers each sequence's valid
frames into reversed order, scans forward, and un-reverses — bit-identical to
packed-sequence semantics with zero padding on the outputs.

Gate math/naming matches torch's LSTM (gates ordered i,f,g,o; two bias
vectors) so converted checkpoints reproduce reference outputs exactly.

Spectral norm on recurrent weights (torch `spectral_norm(lstm,'weight_hh')`)
is stored factored as {sn_w, sn_u, sn_v}; sigma is computed from the stored
power-iteration vectors (stop-gradient), and `spectral_norm_update` performs
the per-step power iteration as a separate pure tree-walk the trainer calls
before the grad step — same math, no mutable state in the forward.
"""

import math

import jax
import jax.numpy as jnp
from jax import lax

# lax.scan unroll factor for the recurrences: each scan step's FLOPs are
# tiny, so per-step loop bookkeeping dominates; unrolling amortizes it at
# the cost of a proportionally larger compiled body. A/B'd on chip.
# unroll=8 on the recurrence scans cuts per-step loop overhead on TPU
# (A/B: decode 2.71 -> 2.13 ms) but multiplies HLO size and compile time
# ~8x; RADTTS_SCAN_UNROLL=1 trades steady-state speed for fast compiles
import os as _os

SCAN_UNROLL = int(_os.environ.get("RADTTS_SCAN_UNROLL", "8"))

# Trace-time override: `with unroll_scope(8): jax.jit(f)(...)` traces the
# recurrence scans at a specific unroll factor regardless of the env
# default. bench.py uses it to compile its reliable unroll=1 stage
# programs first and then OPTIONALLY refine the decode stage at unroll=8
# when budget remains (the full pipeline at unroll=8 exceeds the remote
# compile service's request ceiling; a single stage may not).
from contextlib import contextmanager as _contextmanager

_UNROLL_OVERRIDE = []


@_contextmanager
def unroll_scope(n):
    _UNROLL_OVERRIDE.append(int(n))
    try:
        yield
    finally:
        _UNROLL_OVERRIDE.pop()


def _unroll():
    return _UNROLL_OVERRIDE[-1] if _UNROLL_OVERRIDE else SCAN_UNROLL


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def lstm_cell_init(key, input_size, hidden_size, norm=None):
    """One direction. torch default init U(-1/sqrt(H), 1/sqrt(H)).

    w_ih: (input, 4H) (transposed from torch); recurrent weight kept in torch
    orientation (4H, H) because spectral norm's u/v vectors attach to it.
    """
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    bound = 1.0 / math.sqrt(hidden_size)
    p = {
        "w_ih": _uniform(k1, (input_size, 4 * hidden_size), bound),
        "b_ih": _uniform(k3, (4 * hidden_size,), bound),
        "b_hh": _uniform(k4, (4 * hidden_size,), bound),
    }
    w_hh = _uniform(k2, (4 * hidden_size, hidden_size), bound)
    if norm == "spectral":
        u = jax.random.normal(k5, (4 * hidden_size,))
        v = jax.random.normal(k6, (hidden_size,))
        p["hh"] = {"sn_w": w_hh,
                   "sn_u": u / (jnp.linalg.norm(u) + 1e-12),
                   "sn_v": v / (jnp.linalg.norm(v) + 1e-12)}
    elif norm == "weight":
        g = jnp.sqrt(jnp.sum(w_hh * w_hh, axis=1))
        p["hh"] = {"wn_g": g, "wn_v": w_hh}
    else:
        p["hh"] = {"w": w_hh}
    return p


def effective_hh(hh):
    """Collapse any norm factorization to the effective (4H, H) matrix."""
    if "w" in hh:
        return hh["w"]
    if "wn_v" in hh:
        v = hh["wn_v"]
        norm = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True)) + 1e-30
        return hh["wn_g"][:, None] * v / norm
    w = hh["sn_w"]
    u = lax.stop_gradient(hh["sn_u"])
    v = lax.stop_gradient(hh["sn_v"])
    sigma = u @ (w @ v)
    return w / sigma


def _power_iteration(leaf):
    w, u = leaf["sn_w"], leaf["sn_u"]
    v = w.T @ u
    v = v / (jnp.linalg.norm(v) + 1e-12)
    u = w @ v
    u = u / (jnp.linalg.norm(u) + 1e-12)
    return {"sn_w": w, "sn_u": u, "sn_v": v}


def spectral_norm_update(params):
    """One power-iteration step for every spectral-normed weight in a pytree.
    Call once per training step (matches torch's in-forward update)."""
    def walk(node):
        if isinstance(node, dict):
            if "sn_w" in node:
                return _power_iteration(node)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node
    return walk(params)


def _cell_step(w_hh_t, gx_t, h, c):
    gates = gx_t + h @ w_hh_t
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_apply(params, x, lengths=None, h0=None, c0=None):
    """Unidirectional masked LSTM. x: (B, T, in) -> (B, T, H).

    Where t >= lengths[b], the carry is frozen and the output is zero
    (pack/pad_packed semantics).

    The input projection x @ w_ih (+ biases) is hoisted OUT of the scan as
    one (B·T, in) x (in, 4H) MXU matmul; the scan body keeps only the
    recurrent h @ w_hh term — the per-step work the hardware is actually
    forced to serialize. Same math as torch's fused gates, just batched.
    """
    B, T, _ = x.shape
    H = params["b_ih"].shape[0] // 4
    w_ih = params["w_ih"].astype(x.dtype)
    w_hh_t = effective_hh(params["hh"]).T.astype(x.dtype)
    b = (params["b_ih"] + params["b_hh"]).astype(x.dtype)

    h_init = jnp.zeros((B, H), x.dtype) if h0 is None else h0
    c_init = jnp.zeros((B, H), x.dtype) if c0 is None else c0

    gx = x @ w_ih + b                 # (B, T, 4H) — one big matmul
    gxs = jnp.swapaxes(gx, 0, 1)      # (T, B, 4H)
    if lengths is None:
        valid = jnp.ones((T, B), bool)
    else:
        valid = (jnp.arange(T)[:, None] < lengths[None, :])

    def step(carry, inp):
        h, c = carry
        gx_t, v_t = inp
        h_new, c_new = _cell_step(w_hh_t, gx_t, h, c)
        v = v_t[:, None]
        h = jnp.where(v, h_new, h)
        c = jnp.where(v, c_new, c)
        out = jnp.where(v, h_new, jnp.zeros_like(h_new))
        return (h, c), out

    (h_fin, c_fin), ys = lax.scan(step, (h_init, c_init), (gxs, valid),
                                  unroll=_unroll())
    return jnp.swapaxes(ys, 0, 1), (h_fin, c_fin)


def reverse_padded(x, lengths):
    """Reverse each sequence's first `lengths[b]` frames in place: frame t ->
    lengths[b]-1-t. Frames past the length are left as (masked) garbage."""
    T = x.shape[1]
    idx = lengths[:, None] - 1 - jnp.arange(T)[None, :]
    idx = jnp.clip(idx, 0, T - 1)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def bilstm_apply_multi(params_seq, xs, lengths=None):
    """Run M identically-shaped BiLSTMs as ONE scan.

    params_seq: M bilstm param dicts (same input/hidden sizes); xs: M arrays
    (B, T, C) sharing lengths. All 2M direction-cells are batched along a
    leading axis, so the per-step recurrent matmul becomes a
    (2M,B,H)x(2M,H,4H) batched matmul. Scan steps are serialization overhead
    on TPU — the per-step FLOPs are tiny and the sequencer/loop cost
    dominates — so one scan of T steps beats 2M.

    Returns a list of M outputs, each (B, T, 2H) = [fwd ; bwd] in torch's
    bidirectional=True layout (parity-tested against the separate path)."""
    B, T, _ = xs[0].shape
    dtype = xs[0].dtype
    H = params_seq[0]["fwd"]["b_ih"].shape[0] // 4

    if lengths is None:
        valid = jnp.ones((T, B), bool)
    else:
        valid = (jnp.arange(T)[:, None] < lengths[None, :])

    gx_all, whh_all = [], []
    for p, x in zip(params_seq, xs):
        xr = (jnp.flip(x, axis=1) if lengths is None
              else reverse_padded(x, lengths))
        for cell, xin in ((p["fwd"], x), (p["bwd"], xr)):
            # input projection hoisted out of the scan as one big matmul
            gx = xin @ cell["w_ih"].astype(dtype) + \
                (cell["b_ih"] + cell["b_hh"]).astype(dtype)
            gx_all.append(jnp.swapaxes(gx, 0, 1))        # (T, B, 4H)
            whh_all.append(effective_hh(cell["hh"]).T)
    gxs = jnp.stack(gx_all, axis=1)                      # (T, 2M, B, 4H)
    w_hh_t = jnp.stack(whh_all).astype(dtype)            # (2M, H, 4H)
    D = len(gx_all)

    def step(carry, inp):
        h, c = carry                          # each (D, B, H)
        gx_t, v_t = inp                       # (D, B, 4H), (B,)
        gates = gx_t + jnp.einsum("dbh,dhg->dbg", h, w_hh_t)
        i, fg, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(fg) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        v = v_t[None, :, None]
        h = jnp.where(v, h_new, h)
        c = jnp.where(v, c_new, c)
        out = jnp.where(v, h_new, jnp.zeros_like(h_new))
        return (h, c), out

    init = (jnp.zeros((D, B, H), dtype), jnp.zeros((D, B, H), dtype))
    _, ys = lax.scan(step, init, (gxs, valid),
                     unroll=_unroll())                 # ys: (T, D, B, H)

    outs = []
    for m in range(len(params_seq)):
        out_f = jnp.swapaxes(ys[:, 2 * m], 0, 1)
        out_b = jnp.swapaxes(ys[:, 2 * m + 1], 0, 1)
        if lengths is None:
            out_b = jnp.flip(out_b, axis=1)
        else:
            out_b = reverse_padded(out_b, lengths)
            out_b = out_b * valid.T[:, :, None].astype(out_b.dtype)
        outs.append(jnp.concatenate([out_f, out_b], axis=-1))
    return outs


def bilstm_apply(params, x, lengths=None):
    """Bidirectional masked LSTM; returns (B, T, 2H) = [fwd ; bwd] like
    torch's bidirectional=True output layout. Fwd+bwd run as one scan
    (see bilstm_apply_multi)."""
    return bilstm_apply_multi([params], [x], lengths)[0]


def bilstm_init(key, input_size, hidden_size, norm=None):
    k1, k2 = jax.random.split(key)
    return {"fwd": lstm_cell_init(k1, input_size, hidden_size, norm),
            "bwd": lstm_cell_init(k2, input_size, hidden_size, norm)}


def stacked_lstm_init(key, input_size, hidden_size, n_layers, norm=None):
    params = []
    d = input_size
    for _ in range(n_layers):
        key, sub = jax.random.split(key)
        params.append(lstm_cell_init(sub, d, hidden_size, norm))
        d = hidden_size
    return {"layers": params}


def stacked_lstm_apply(params, x, lengths=None, carries=None):
    """Multi-layer unidirectional LSTM (AGAP decoder LSTM). Returns output
    and per-layer final (h, c) carries."""
    new_carries = []
    for i, lp in enumerate(params["layers"]):
        h0c0 = (None, None) if carries is None else carries[i]
        x, hc = lstm_apply(lp, x, lengths, h0=h0c0[0], c0=h0c0[1])
        new_carries.append(hc)
    return x, new_carries
