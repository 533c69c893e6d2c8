"""Static (non-traced) metadata nodes for params pytrees.

Model hyper-structure (layer counts, kernel sizes, scaling-fn names) lives
next to the weights as `Static` nodes: they flatten to zero leaves and ride
along as hashable aux data, so jit re-specializes when the architecture
changes but never traces them.
"""

import jax


@jax.tree_util.register_pytree_node_class
class Static:
    __slots__ = ("_d",)

    def __init__(self, **kwargs):
        self._d = dict(kwargs)

    def __getitem__(self, k):
        return self._d[k]

    def get(self, k, default=None):
        return self._d.get(k, default)

    def __contains__(self, k):
        return k in self._d

    def __repr__(self):
        return f"Static({self._d})"

    def __eq__(self, other):
        return isinstance(other, Static) and self._d == other._d

    def __hash__(self):
        return hash(tuple(sorted(self._d.items())))

    def tree_flatten(self):
        return (), tuple(sorted(self._d.items()))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj._d = dict(aux)
        return obj


def static(**kwargs):
    """Build a Static node; lists are converted to tuples for hashability."""
    clean = {k: tuple(v) if isinstance(v, list) else v
             for k, v in kwargs.items()}
    return Static(**clean)


# jax.export serialization (bench.py round-trips the traced flagship
# program through a disk artifact; params pytrees carry Static nodes).
# Aux data is a tuple of sorted (key, value) pairs whose values are
# scalars/strings or (possibly nested) tuples — JSON-encode with tuples
# tagged so the round-trip is exact (plain JSON would turn them into
# lists, changing the treedef hash).
def _enc(v):
    if isinstance(v, tuple):
        return {"__t": [_enc(x) for x in v]}
    return v


def _dec(v):
    if isinstance(v, dict) and "__t" in v:
        return tuple(_dec(x) for x in v["__t"])
    return v


try:
    import json

    jax.export.register_pytree_node_serialization(
        Static,
        serialized_name="radtts_tpu.ops.static.Static",
        serialize_auxdata=lambda aux: json.dumps(_enc(aux)).encode(),
        deserialize_auxdata=lambda b: _dec(json.loads(b.decode())),
    )
except Exception:  # registration is only needed for export round-trips
    pass
