"""Analytic matmul/conv FLOP counting from a jaxpr.

XLA's compiled-HLO cost analysis counts every op of the OPTIMIZED program —
unrolled scans, rematerialized subgraphs, elementwise epilogues — and grades
fp32 ops against the bf16 peak table, which inflates MFU claims. This module
walks the (pre-optimization) jaxpr and counts only the MXU-shaped work:
`dot_general` and `conv_general_dilated`, scaled by scan trip counts. That is
the conventional "model FLOPs" numerator for MFU (the scaling-book
convention: 2*M*N*K per matmul, forward and AD-generated backward ops both
appear in a grad jaxpr, so no 3x fudge factor is needed).
"""

import math

import jax


def _dot_flops(eqn):
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = math.prod(lhs.shape[d] for d in lb)
    contract = math.prod(lhs.shape[d] for d in lc)
    lhs_free = math.prod(
        lhs.shape[d] for d in range(lhs.ndim) if d not in lc and d not in lb)
    rhs_free = math.prod(
        rhs.shape[d] for d in range(rhs.ndim) if d not in rc and d not in rb)
    return 2 * batch * contract * lhs_free * rhs_free


def _conv_flops(eqn):
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    k_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    # rhs input-channel dim is ALREADY per-group (C_in/groups), so each
    # output element costs 2*c_in*k FLOPs with no further group division
    c_in = rhs.shape[dn.rhs_spec[1]]
    return 2 * math.prod(out.shape) * c_in * k_spatial


def _sub_jaxprs(eqn):
    """(jaxpr, multiplier) pairs for higher-order primitives."""
    name = eqn.primitive.name
    p = eqn.params
    if name == "scan":
        return [(p["jaxpr"].jaxpr, p["length"])]
    if name == "while":
        # trip count unknown at trace time; count one iteration
        return [(p["body_jaxpr"].jaxpr, 1)]
    if name == "cond":
        # count the most expensive branch
        subs = [(b.jaxpr, 1) for b in p["branches"]]
        if not subs:
            return []
        best = max(subs, key=lambda s: count_matmul_flops_jaxpr(s[0]))
        return [best]
    out = []
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in p:
            j = p[key]
            out.append((getattr(j, "jaxpr", j), 1))
    return out


def count_matmul_flops_jaxpr(jaxpr):
    """Total dot/conv FLOPs in a jaxpr, recursing through scan/cond/calls."""
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        else:
            for sub, mult in _sub_jaxprs(eqn):
                total += mult * count_matmul_flops_jaxpr(sub)
    return total


def count_matmul_flops(fn, *args, **kwargs):
    """Analytic matmul/conv FLOPs of one call of `fn` (traced, not run).

    For a value_and_grad/train-step fn the backward ops are part of the
    traced jaxpr, so the result already includes them."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return count_matmul_flops_jaxpr(closed.jaxpr)


def _dot_mnk(eqn):
    """(batch, M, N, K) of a dot_general: per-instance matmul is
    (M x K) @ (K x N), repeated `batch` times."""
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = math.prod(lhs.shape[d] for d in lb)
    K = math.prod(lhs.shape[d] for d in lc)
    M = math.prod(
        lhs.shape[d] for d in range(lhs.ndim) if d not in lc and d not in lb)
    N = math.prod(
        rhs.shape[d] for d in range(rhs.ndim) if d not in rc and d not in rb)
    return batch, M, N, K


def _conv_mnk(eqn):
    """im2col view of a conv: M = batch*spatial_out, K = C_in*k, N = C_out."""
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    k_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    c_in = rhs.shape[dn.rhs_spec[1]]
    c_out = out.shape[dn.out_spec[1]]
    m = math.prod(out.shape) // c_out
    return 1, m, c_out, c_in * k_spatial


def mxu_records(fn, *args, **kwargs):
    """Every dot/conv in fn's jaxpr as a record for roofline analysis:
    dicts with kind, batch/M/N/K, flops per occurrence, and the product
    of enclosing scan trip counts (`trips`; 1 = not inside a scan). A
    dot inside a scan of length L is L sequentially-dependent MXU
    dispatches — the serialization that bounds LSTM-heavy steps."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    records = []

    def op_bytes(eqn):
        """HBM floor bytes of one occurrence: operands read once, result
        written once (post-fusion, each tensor at a conv/dot boundary
        crosses HBM at most once unless it fits in VMEM — a floor)."""
        total = 0
        for v in list(eqn.invars) + list(eqn.outvars):
            aval = getattr(v, "aval", None)
            if aval is not None and hasattr(aval, "shape"):
                total += math.prod(aval.shape) * aval.dtype.itemsize
        return total

    def walk(jaxpr, trips):
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            if name == "dot_general":
                b, m, n, k = _dot_mnk(eqn)
                records.append(dict(kind="dot", batch=b, m=m, n=n, k=k,
                                    flops=_dot_flops(eqn), trips=trips,
                                    bytes=op_bytes(eqn)))
            elif name == "conv_general_dilated":
                b, m, n, k = _conv_mnk(eqn)
                records.append(dict(kind="conv", batch=b, m=m, n=n, k=k,
                                    flops=_conv_flops(eqn), trips=trips,
                                    bytes=op_bytes(eqn)))
            else:
                for sub, mult in _sub_jaxprs(eqn):
                    walk(sub, trips * mult)

    walk(closed.jaxpr, 1)
    return records
