"""Device mesh + sharding rules.

The reference's only parallelism is hand-rolled NCCL data parallelism
(reference: distributed.py:101-153). Here:

  * 'data' axis: batch sharding (DP) — gradients all-reduce over ICI
    automatically under jit;
  * 'model' axis: tensor parallelism over the WN coupling networks' hidden
    channels (the decoder's FLOP hotspot, 1024-wide convs): in_layers /
    res_skip weights are sharded on their output-channel axis and the end
    projection contracts over the sharded axis (GSPMD inserts the psum).

Layouts follow conv weight storage (K, C_in, C_out).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=1, devices=None):
    devices = np.array(devices if devices is not None else jax.devices())
    n_total = devices.size
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model == n_total, (n_data, n_model, n_total)
    return Mesh(devices.reshape(n_data, n_model), ("data", "model"))


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def _tp_spec(path, leaf, n_model):
    """Tensor-parallel PartitionSpec for a param leaf, or None (replicate).

    Shards the WN hidden channels of every decoder flow step: in_layers and
    res_skip convs split output channels; 'end' splits input channels (its
    contraction produces the all-reduce)."""
    if n_model <= 1:
        return None
    if "/affine/pred/" not in path:
        return None
    hidden_axis = None
    if "/in_layers/" in path or "/res_skip/" in path or "/start" in path:
        # weight (K, C_in, C_out) -> shard C_out; bias/g (C_out,)
        if leaf.ndim == 3 and leaf.shape[2] % n_model == 0:
            hidden_axis = P(None, None, "model")
        elif leaf.ndim == 1 and leaf.shape[0] % n_model == 0:
            hidden_axis = P("model")
    elif "/end/" in path or path.endswith("/end/b") or "/end" in path:
        # end conv contracts the sharded hidden channels: (1, C_hid, 2n_in)
        if leaf.ndim == 3 and leaf.shape[1] % n_model == 0:
            hidden_axis = P(None, "model", None)
    return hidden_axis


def param_shardings(params, mesh):
    """NamedSharding tree: replicated by default, TP rules on the WN stacks
    when the mesh has a nontrivial 'model' axis."""
    n_model = mesh.shape["model"]
    replicated = NamedSharding(mesh, P())

    def assign(path, leaf):
        spec = _tp_spec(_path_str(path), leaf, n_model)
        if spec is None:
            return replicated
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def batch_shardings(batch, mesh):
    data_sharded = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda _: data_sharded, batch)


def replicate(tree, mesh):
    replicated = NamedSharding(mesh, P())
    return jax.device_put(tree, replicated)
