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
    """torch tensor -> HOST fp32 array (numpy).

    Deliberately not a device array: converters run leaf-by-leaf, and an
    eager `jnp.asarray` per leaf is one host->device dispatch each — on a
    tunneled TPU backend that is hundreds of round trips (~30 s for the
    flagship checkpoint, measured). Host leaves upload in ONE transfer at
    the first jitted use (e.g. the synthesizer's fold program)."""
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


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
        p["v"] = np.transpose(v, (2, 1, 0))
    else:
        w = t2j(sd[prefix + ".weight"])
        p["w"] = np.transpose(w, (2, 1, 0))
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


# ---------------------------------------------------------------------------
# attribute predictors
# ---------------------------------------------------------------------------


def _p(prefix):
    return prefix + "." if prefix else ""


def bottleneck_from_torch(sd, prefix, template):
    return {"proj": conv1d_from_torch(sd, _p(prefix) + "projection_fn.conv",
                                      weight_norm=True),
            "_meta": template["_meta"]}


def conv_lstm_linear_from_torch(sd, prefix, template):
    meta = template["_meta"]
    p = {"convs": [conv1d_from_torch(sd, f"{_p(prefix)}convolutions.{i}",
                                     weight_norm=True)
                   for i in range(len(template["convs"]))],
         "_meta": meta}
    if meta["lstm_type"] == "bilstm":
        p["lstm"] = bilstm_from_torch(sd, _p(prefix) + "bilstm",
                                      norm="spectral")
    elif meta["lstm_type"]:
        p["lstm"] = lstm_cell_from_torch(sd, _p(prefix) + "bilstm",
                                         norm="spectral")
    if meta["use_linear"]:
        p["dense"] = linear_from_torch(sd, _p(prefix) + "dense")
    return p


def fft_from_torch(sd, prefix, template):
    layers = []
    for i, ltmpl in enumerate(template["layers"]):
        base = f"{_p(prefix)}layers.{i}"
        attn = {
            "qkv": linear_from_torch(sd, base + ".dec_attn.qkv_net"),
            "o": linear_from_torch(sd, base + ".dec_attn.o_net", bias=False),
            "ln": layer_norm_from_torch(sd, base + ".dec_attn.layer_norm"),
            "_meta": ltmpl["attn"]["_meta"],
        }
        ff = {
            "conv1": conv1d_from_torch(sd, base + ".pos_ff.CoreNet.0"),
            "conv2": conv1d_from_torch(sd, base + ".pos_ff.CoreNet.2"),
            "ln": layer_norm_from_torch(sd, base + ".pos_ff.layer_norm"),
            "_meta": ltmpl["ff"]["_meta"],
        }
        layers.append({"attn": attn, "ff": ff})
    return {"layers": layers,
            "dense": linear_from_torch(sd, _p(prefix) + "dense.linear_layer"),
            "_meta": template["_meta"]}


def dap_from_torch(sd, prefix, template):
    p = {"bottleneck": bottleneck_from_torch(
        sd, _p(prefix) + "bottleneck_layer", template["bottleneck"]),
        "_meta": template["_meta"], "_kind": template.get("_kind")}
    if template["_meta"]["use_transformer"]:
        p["feat"] = fft_from_torch(sd, _p(prefix) + "feat_pred_fn",
                                   template["feat"])
    else:
        p["feat"] = conv_lstm_linear_from_torch(
            sd, _p(prefix) + "feat_pred_fn", template["feat"])
    return {k: v for k, v in p.items() if v is not None}


def bgap_from_torch(sd, prefix, template):
    meta = template["_meta"]
    n_flows = meta["n_flows"]
    n_spline = meta["n_spline_steps"]
    transforms, convinv = [], []
    for k in range(n_flows):
        convinv.append(inv1x1_from_torch(sd, f"{_p(prefix)}convinv.{k}"))
        if k >= n_flows - n_spline:
            transforms.append(spline_coupling_from_torch(
                sd, f"{_p(prefix)}transforms.{k}", template["transforms"][k]))
        else:
            transforms.append(affine_coupling_from_torch(
                sd, f"{_p(prefix)}transforms.{k}", template["transforms"][k]))
    p = {"bottleneck": bottleneck_from_torch(
        sd, _p(prefix) + "bottleneck_layer", template["bottleneck"]),
        "transforms": transforms, "convinv": convinv,
        "_meta": meta, "_kind": template.get("_kind")}
    return {k: v for k, v in p.items() if v is not None}


def ar_step_from_torch(sd, prefix, template):
    n_lstm_layers = len(template["lstm"]["layers"])
    p = {"attr_lstm": lstm_cell_from_torch(sd, _p(prefix) + "attr_lstm"),
         "lstm": stacked_lstm_from_torch(sd, _p(prefix) + "lstm",
                                         n_lstm_layers),
         "_meta": template["_meta"]}
    if template["_meta"]["has_spline"]:
        p["spline_flow"] = {
            "pred": simple_convnet_from_torch(
                sd, _p(prefix) + "spline_flow.param_predictor",
                template["spline_flow"]["pred"]["_meta"]),
            "_meta": template["spline_flow"]["_meta"]}
    else:
        n_dense = len(template["dense"]["layers"])
        p["dense"] = {"layers": [
            linear_from_torch(sd, f"{_p(prefix)}dense_layer.layers.{j}"
                              ".linear_layer") for j in range(n_dense)]}
        p["conv"] = conv1d_from_torch(sd, _p(prefix) + "conv")
    return p


def agap_from_torch(sd, prefix, template):
    flows = []
    for i, ftmpl in enumerate(template["flows"]):
        base = (f"{_p(prefix)}flows.{i}" if i % 2 == 0
                else f"{_p(prefix)}flows.{i}.ar_step")
        flows.append(ar_step_from_torch(sd, base, ftmpl))
    p = {"bottleneck": bottleneck_from_torch(
        sd, _p(prefix) + "bottleneck_layer", template["bottleneck"]),
        "flows": flows, "_meta": template["_meta"],
        "_kind": template.get("_kind")}
    return {k: v for k, v in p.items() if v is not None}


def attribute_model_from_torch(sd, prefix, template):
    name = template["_kind"]["name"]
    fn = {"dap": dap_from_torch, "bgap": bgap_from_torch,
          "agap": agap_from_torch}[name]
    return fn(sd, prefix, template)


# ---------------------------------------------------------------------------
# full RADTTS model
# ---------------------------------------------------------------------------


def radtts_from_torch(sd, model_config, template=None, strict=True):
    """Convert a reference RADTTS state_dict (train.py:190-197 checkpoint
    'state_dict') into our params pytree. A template built by radtts_init is
    used for structure; pass one to avoid re-initializing."""
    import jax

    from radtts_tpu.models.radtts import radtts_init

    if template is None:
        template = radtts_init(jax.random.PRNGKey(0), model_config)
    meta = template["_meta"]

    p = {"_meta": meta}
    p["speaker_embedding"] = embedding_from_torch(sd, "speaker_embedding")
    p["embedding"] = embedding_from_torch(sd, "embedding")

    enc_norm = None
    if model_config.get("text_encoder_lstm_norm"):
        n = model_config["text_encoder_lstm_norm"]
        enc_norm = ("spectral" if "spectral" in n
                    else "weight" if "weight" in n else None)
    p["encoder"] = encoder_from_torch(sd, "encoder", n_convs=3,
                                      lstm_norm=enc_norm)

    if "attention" in template:
        p["attention"] = conv_attention_from_torch(sd, "attention")

    if "context_lstm" in template:
        cn = model_config.get("context_lstm_norm")
        ctx_norm = (None if cn is None else
                    "spectral" if "spectral" in cn
                    else "weight" if "weight" in cn else None)
        p["context_lstm"] = bilstm_from_torch(sd, "context_lstm",
                                              norm=ctx_norm)

    if "flows" in template:
        flows = []
        for i, ftmpl in enumerate(template["flows"]):
            base = f"flows.{i}"
            if meta["matrix_decomposition"] == "LUS":
                inv = inv1x1_lus_from_torch(sd, base + ".invtbl_conv")
            else:
                inv = inv1x1_from_torch(sd, base + ".invtbl_conv")
            affine = affine_coupling_from_torch(
                sd, base + ".affine_tfn", ftmpl["affine"])
            flows.append({"inv": inv, "affine": affine})
        p["flows"] = flows

    if "dur_pred_layer" in template:
        p["dur_pred_layer"] = attribute_model_from_torch(
            sd, "dur_pred_layer", template["dur_pred_layer"])
    if "unvoiced_bias" in template:
        p["unvoiced_bias"] = linear_from_torch(
            sd, "unvoiced_bias_module.0.linear_layer")
    if "v_pred_module" in template:
        p["v_pred_module"] = attribute_model_from_torch(
            sd, "v_pred_module", template["v_pred_module"])
    if "v_embeddings" in template:
        p["v_embeddings"] = embedding_from_torch(sd, "v_embeddings")
    if "f0_pred_module" in template:
        p["f0_pred_module"] = attribute_model_from_torch(
            sd, "f0_pred_module", template["f0_pred_module"])
    if "energy_pred_module" in template:
        p["energy_pred_module"] = attribute_model_from_torch(
            sd, "energy_pred_module", template["energy_pred_module"])
    return p
