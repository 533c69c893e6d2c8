"""Inference-time parameter folding (the reference's `remove_norms`,
radtts.py:732-750, as a pure pytree transform).

Training pytrees keep torch-compatible norm FACTORIZATIONS: conv weight
norm stores (v, g) (reference common.py:121-154 via nn.utils.weight_norm)
and LSTM spectral / weight norm stores (sn_w, sn_u, sn_v) / (wn_v, wn_g)
(reference radtts.py:150-163). Every jitted inference call therefore
re-collapses each factor on device: for one decode pass through the 8 WN
coupling stacks that is a full extra read + write of ~100 MB of conv
weights per flow — traffic that, unlike the folded kernels' own reads,
does NOT hide behind the serialized scans (folding measured decode
3.92 -> ~3.3 ms on chip).

`fold_norms` walks the pytree ONCE at load time and replaces every
factorization with its effective weight — the same expressions
`effective_weight` / `effective_hh` evaluate per call, so the math is
unchanged (the reference's remove_norms has the same contract; measured
on chip: bit-equal outputs and decode 3.92 -> ~3.3 ms,
scripts/ab_fold_bf16.py). With ``matmul_dtype=jnp.bfloat16`` it
additionally stores conv kernels in bf16: at DEFAULT matmul precision
the TPU MXU truncates fp32 operands to bf16 anyway (docs/DESIGN.md
section 9), so each dot's result is what the fp32-stored weight already
produced (bit-equal on chip, verified with the WN heads perturbed away
from their vacuous zero init) while the resident weight bytes halve.
Note this is a FOOTPRINT lever, not a latency one: the decode roofline
(scripts/roofline_decode.py) charges the WN pool 0.92 ms of weight HBM,
but repeated A/Bs time fp32- and bf16-stored decode identically within
noise — the weight streams overlap the serialized LSTM/DAP scans.
Numerically sensitive leaves keep fp32: invertible-1x1 factors and their
precomputed inverses (HIGHEST-precision matmuls, ops/invertible.py),
embeddings, biases, LSTM recurrences, and the whole text-encoder subtree
(the reference runs it under autocast(False), common.py:341).
"""

import jax.numpy as jnp

from radtts_tpu.ops.conv import effective_weight
from radtts_tpu.ops.lstm import effective_hh

# fp32 islands: subtrees never dtype-cast (collapse still applies).
# "encoder" = the text encoder (reference common.py:341 autocast(False)).
_NO_CAST_KEYS = ("encoder",)


def fold_norms(params, matmul_dtype=None):
    """Collapse norm factorizations in a param pytree; optionally store
    conv kernels in `matmul_dtype` (bf16 halves weight HBM traffic).

    Safe on any of this package's pytrees: only dicts matching the conv
    weight-norm pattern ({v, g [, b]} with 3-D v), the LSTM hh-norm
    patterns ({sn_w, sn_u, sn_v} / {wn_v, wn_g}), or plain 3-D conv
    kernels ({w [, b]}) are rewritten; everything else (invertible-1x1
    groups, embeddings, "_meta" statics) passes through untouched.
    """

    def check(node, allowed):
        # a matched pattern must contain EXACTLY the expected keys: the
        # rewrite replaces the whole dict, so an unexpected sibling key
        # would be silently dropped — fail loudly instead
        extra = set(node) - allowed
        if extra:
            raise ValueError(
                f"fold_norms: dict matching pattern {sorted(allowed)} "
                f"carries unexpected keys {sorted(extra)}; refusing to "
                "drop them")

    def walk(node, cast):
        if isinstance(node, dict):
            if "v" in node and "g" in node and getattr(
                    node["v"], "ndim", 0) == 3:
                check(node, {"v", "g", "b"})
                out = {"w": effective_weight(node)}
                if "b" in node:
                    out["b"] = node["b"]
            elif "sn_w" in node or ("wn_v" in node and "wn_g" in node):
                check(node, {"sn_w", "sn_u", "sn_v"} if "sn_w" in node
                      else {"wn_v", "wn_g"})
                return {"w": effective_hh(node)}
            elif (set(node) <= {"w", "b"} and "w" in node
                    and getattr(node["w"], "ndim", 0) == 3):
                out = dict(node)
            else:
                return {k: (v if k == "_meta"
                            else walk(v, cast and k not in _NO_CAST_KEYS))
                        for k, v in node.items()}
            if (cast and matmul_dtype is not None
                    and out["w"].dtype == jnp.float32):
                out["w"] = out["w"].astype(matmul_dtype)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, cast) for v in node)
        return node

    return walk(params, True)
