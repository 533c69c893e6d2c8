"""Torch checkpoint -> radtts_tpu params conversion.

The reference publishes torch checkpoints ({'state_dict': ...},
reference: train.py:190-197); this module maps those tensors onto our
channels-last functional pytrees so pretrained RADTTS / HiFi-GAN weights load
and give matching outputs.

Primitive converters here; model-level state_dict walkers live next to each
model builder.
"""

import numpy as np
import jax.numpy as jnp


def t2j(t):
    """torch tensor -> jnp array (fp32)."""
    return jnp.asarray(np.asarray(t.detach().cpu().numpy(), dtype=np.float32))


def conv1d_from_torch(sd, prefix, *, bias=True, weight_norm=False):
    """torch Conv1d '{prefix}.weight' (out,in,k) -> our {'w': (k,in,out)}.

    weight_norm=True reads the factored weight_g/weight_v pair and keeps the
    factorization (so finetuning matches torch's parametrization).
    """
    p = {}
    if weight_norm:
        g = t2j(sd[prefix + ".weight_g"])  # (out,1,1)
        v = t2j(sd[prefix + ".weight_v"])  # (out,in,k)
        p["g"] = g.reshape(-1)
        p["v"] = jnp.transpose(v, (2, 1, 0))
    else:
        w = t2j(sd[prefix + ".weight"])
        p["w"] = jnp.transpose(w, (2, 1, 0))
    if bias:
        p["b"] = t2j(sd[prefix + ".bias"])
    return p


def linear_from_torch(sd, prefix, *, bias=True):
    p = {"w": t2j(sd[prefix + ".weight"]).T}
    if bias:
        p["b"] = t2j(sd[prefix + ".bias"])
    return p


def lstm_cell_from_torch(sd, prefix, *, suffix="", norm=None):
    """One LSTM direction. torch names: weight_ih_l0[_reverse], etc.
    norm='spectral': reads weight_hh_l0{sfx}_orig + _u + _v.
    norm='weight':   reads weight_hh_l0{sfx}_g + _v.
    """
    pfx = prefix + "." if prefix else ""
    ih = t2j(sd[f"{pfx}weight_ih_l0{suffix}"])  # (4H, in)
    p = {
        "w_ih": ih.T,
        "b_ih": t2j(sd[f"{pfx}bias_ih_l0{suffix}"]),
        "b_hh": t2j(sd[f"{pfx}bias_hh_l0{suffix}"]),
    }
    base = f"{pfx}weight_hh_l0{suffix}"
    if norm == "spectral":
        p["hh"] = {"sn_w": t2j(sd[base + "_orig"]),
                   "sn_u": t2j(sd[base + "_u"]),
                   "sn_v": t2j(sd[base + "_v"])}
    elif norm == "weight":
        p["hh"] = {"wn_g": t2j(sd[base + "_g"]).reshape(-1),
                   "wn_v": t2j(sd[base + "_v"])}
    else:
        p["hh"] = {"w": t2j(sd[base])}
    return p


def bilstm_from_torch(sd, prefix, norm=None):
    return {"fwd": lstm_cell_from_torch(sd, prefix, suffix="", norm=norm),
            "bwd": lstm_cell_from_torch(sd, prefix, suffix="_reverse",
                                        norm=norm)}


def stacked_lstm_from_torch(sd, prefix, n_layers, norm=None):
    pfx = prefix + "." if prefix else ""
    layers = []
    for i in range(n_layers):
        ih = t2j(sd[f"{pfx}weight_ih_l{i}"])
        layers.append({
            "w_ih": ih.T,
            "b_ih": t2j(sd[f"{pfx}bias_ih_l{i}"]),
            "b_hh": t2j(sd[f"{pfx}bias_hh_l{i}"]),
            "hh": {"w": t2j(sd[f"{pfx}weight_hh_l{i}"])},
        })
    return {"layers": layers}


def inv1x1_lus_from_torch(sd, prefix):
    pfx = prefix + "." if prefix else ""
    return {"p": t2j(sd[pfx + "p"]),
            "lower": t2j(sd[pfx + "lower"]),
            "upper": t2j(sd[pfx + "upper"]),
            "upper_diag": t2j(sd[pfx + "upper_diag"])}


def inv1x1_from_torch(sd, prefix):
    pfx = prefix + "." if prefix else ""
    w = t2j(sd[pfx + "conv.weight"])  # (c, c, 1)
    return {"w1x1": w[:, :, 0]}


def wn_from_torch(sd, prefix, meta):
    pfx = prefix + "." if prefix else ""
    n_layers = meta["n_layers"]
    return {
        "start": conv1d_from_torch(sd, pfx + "start", weight_norm=True),
        "end": conv1d_from_torch(sd, pfx + "end"),
        "in_layers": [conv1d_from_torch(sd, f"{pfx}in_layers.{i}.conv",
                                        weight_norm=True)
                      for i in range(n_layers)],
        "res_skip": [conv1d_from_torch(sd, f"{pfx}res_skip_layers.{i}",
                                       weight_norm=True)
                     for i in range(n_layers)],
        "_meta": meta,
    }


def simple_convnet_from_torch(sd, prefix, meta):
    pfx = prefix + "." if prefix else ""
    n_layers = meta["n_layers"]
    return {
        "layers": [conv1d_from_torch(sd, f"{pfx}layers.{i}.conv")
                   for i in range(n_layers)],
        "last": conv1d_from_torch(sd, pfx + "last_layer"),
        "_meta": meta,
    }


def affine_coupling_from_torch(sd, prefix, params_template):
    """Fill an affine coupling params pytree (from affine_coupling_init) with
    torch weights at '{prefix}.affine_param_predictor'."""
    meta = params_template["_meta"]
    pfx = prefix + "." if prefix else ""
    pred_meta = params_template["pred"]["_meta"]
    if meta["affine_model"] == "wavenet":
        pred = wn_from_torch(sd, pfx + "affine_param_predictor", pred_meta)
    else:
        pred = simple_convnet_from_torch(
            sd, pfx + "affine_param_predictor", pred_meta)
    return {"pred": pred, "_meta": meta}


def spline_coupling_from_torch(sd, prefix, params_template):
    meta = params_template["_meta"]
    pfx = prefix + "." if prefix else ""
    pred = simple_convnet_from_torch(
        sd, pfx + "param_predictor", params_template["pred"]["_meta"])
    return {"pred": pred, "_meta": meta}


def encoder_from_torch(sd, prefix, n_convs=3, lstm_norm=None):
    pfx = prefix + "." if prefix else ""
    convs = [conv1d_from_torch(sd, f"{pfx}convolutions.{i}.0.conv")
             for i in range(n_convs)]
    norms = [instance_norm_from_torch(sd, f"{pfx}convolutions.{i}.1")
             for i in range(n_convs)]
    lstm = bilstm_from_torch(sd, pfx + "lstm", norm=lstm_norm)
    from radtts_tpu.ops.static import static
    return {"convs": convs, "norms": norms, "lstm": lstm,
            "_meta": static(n_convs=n_convs)}


def conv_attention_from_torch(sd, prefix):
    pfx = prefix + "." if prefix else ""
    return {
        "key_proj": [conv1d_from_torch(sd, f"{pfx}key_proj.0.conv"),
                     conv1d_from_torch(sd, f"{pfx}key_proj.2.conv")],
        "query_proj": [conv1d_from_torch(sd, f"{pfx}query_proj.0.conv"),
                       conv1d_from_torch(sd, f"{pfx}query_proj.2.conv"),
                       conv1d_from_torch(sd, f"{pfx}query_proj.4.conv")],
    }


def embedding_from_torch(sd, prefix):
    return {"table": t2j(sd[prefix + ".weight"])}


def instance_norm_from_torch(sd, prefix):
    return {"gamma": t2j(sd[prefix + ".weight"]),
            "beta": t2j(sd[prefix + ".bias"])}


def layer_norm_from_torch(sd, prefix):
    return {"gamma": t2j(sd[prefix + ".weight"]),
            "beta": t2j(sd[prefix + ".bias"])}
