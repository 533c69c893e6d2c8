"""Checkpoint save/load.

Native format: a single .npz of path->array leaves plus a JSON sidecar with
iteration / learning rate (compare reference torch.save dict,
train.py:190-197). Torch checkpoints from the reference load through
radtts_tpu.convert. Warmstart include/ignore filters operate on path
substrings like the reference's state_dict-key filters (train.py:159-176).
"""

import json
import os

import jax
import numpy as np


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def tree_to_flat_dict(tree):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_path_str(path): np.asarray(leaf) for path, leaf in leaves}


def flat_dict_to_tree(template, flat, *, strict=True, filter_fn=None):
    """Fill `template`'s leaves from a path->array dict. filter_fn(path_str)
    selects which paths may be overwritten (warmstart filters)."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    missing = []
    for path, leaf in leaves:
        key = _path_str(path)
        if key in flat and (filter_fn is None or filter_fn(key)):
            arr = np.asarray(flat[key])
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch for {key}: ckpt {arr.shape} vs model "
                    f"{leaf.shape}")
            # materialize on the HOST (numpy): an eager jnp.asarray per
            # leaf is one host->device dispatch each, and on tunneled TPU
            # backends that turns a checkpoint load into hundreds of round
            # trips (~50 s flagship, measured). Host leaves ride to the
            # device in ONE transfer at the first jitted use.
            out.append(arr.astype(leaf.dtype, copy=False))
        else:
            if key not in flat:
                missing.append(key)
            out.append(leaf)
    if strict and missing:
        raise KeyError(f"missing {len(missing)} params, e.g. {missing[:5]}")
    return jax.tree_util.tree_unflatten(
        treedef, [x for x in out])


def save_checkpoint(path, params, opt_state=None, iteration=0,
                    learning_rate=0.0, extra=None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    def to_np(v):
        arr = np.asarray(v)
        if arr.dtype.kind == "V":  # ml_dtypes (bfloat16): npz can't
            # round-trip extension dtypes — store fp32 (bf16->fp32 is
            # exact; load_checkpoint casts back via the template dtype)
            arr = np.asarray(jax.numpy.asarray(v, jax.numpy.float32))
        return arr

    payload = {f"params/{k}": to_np(v)
               for k, v in tree_to_flat_dict(params).items()}
    if opt_state is not None:
        payload.update({f"opt/{k}": to_np(v)
                        for k, v in tree_to_flat_dict(opt_state).items()})
    np.savez(path if path.endswith(".npz") else path + ".npz", **payload)
    meta = {"iteration": int(iteration),
            "learning_rate": float(learning_rate)}
    if extra:
        meta.update(extra)
    with open((path[:-4] if path.endswith(".npz") else path) + ".json",
              "w") as f:
        json.dump(meta, f)


def load_checkpoint(path, params_template, opt_state_template=None):
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    flat_params = {k[len("params/"):]: data[k] for k in data.files
                   if k.startswith("params/")}
    params = flat_dict_to_tree(params_template, flat_params)
    opt_state = None
    if opt_state_template is not None:
        flat_opt = {k[len("opt/"):]: data[k] for k in data.files
                    if k.startswith("opt/")}
        if flat_opt:
            opt_state = flat_dict_to_tree(opt_state_template, flat_opt)
    meta_path = (npz_path[:-4]) + ".json"
    meta = {"iteration": 0, "learning_rate": 0.0}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta.update(json.load(f))
    return params, opt_state, meta


def is_torch_checkpoint(path):
    return not (path.endswith(".npz")
                or os.path.exists(path + ".npz"))


def load_any_radtts_checkpoint(path, model_config, params_template):
    """Load either a native .npz checkpoint or a reference torch checkpoint
    (converted on the fly). Returns (params, meta)."""
    if is_torch_checkpoint(path):
        import torch

        from radtts_tpu.convert import radtts_from_torch
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        params = radtts_from_torch(sd, model_config,
                                   template=params_template)
        meta = {"iteration": int(ckpt.get("iteration", 0)),
                "learning_rate": float(ckpt.get("learning_rate", 0.0))}
        return params, meta
    params, _, meta = load_checkpoint(path, params_template)
    return params, meta


def load_radtts_for_inference(path, model_config):
    """Template-first checkpoint load for inference engines.

    Inference checkpoints are complete (every leaf present), so the
    template only supplies structure/shape/dtype and the Static `_meta`
    nodes — build it with radtts_template (jax.eval_shape) instead of
    paying radtts_init's eager work (measured 109 s vs 3.8 s at flagship
    scale, radtts_tpu/models/radtts.py:radtts_template). Falls back to a
    real init if the checkpoint turns out partial (strict-fill KeyError)
    or the shape pass fails, so behavior degrades to the old path rather
    than erroring."""
    import jax

    from radtts_tpu.models.radtts import radtts_init, radtts_template
    try:
        return load_any_radtts_checkpoint(path, model_config,
                                          radtts_template(model_config))
    except Exception as e:  # noqa: BLE001 — any failure -> slow, safe path
        print(f"[checkpoint] template-first load failed "
              f"({type(e).__name__}: {e}); falling back to full init",
              flush=True)
        template = radtts_init(jax.random.PRNGKey(0), model_config)
        return load_any_radtts_checkpoint(path, model_config, template)


def warmstart_filter(include_layers, ignore_layers_warmstart):
    def fn(key):
        if include_layers and not any(l in key for l in include_layers):
            return False
        if ignore_layers_warmstart and any(
                l in key for l in ignore_layers_warmstart):
            return False
        return True
    return fn
