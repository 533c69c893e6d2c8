"""radtts_tpu params -> reference torch checkpoint export.

Inverse of radtts_tpu.convert: a model trained (or fine-tuned) in this
framework can be exported as a `{'state_dict': ...}` checkpoint that the
reference PyTorch implementation loads with `strict=True`
(reference: train.py:190-197 save format, train.py:179-187 load). Norm
factorizations are preserved — weight-norm convs export weight_g/weight_v,
spectral-norm LSTMs export weight_hh_l0_orig/_u/_v — so round-tripping a
converted checkpoint reproduces the original tensors exactly.

Every walker mirrors its `*_from_torch` twin in radtts_tpu/convert.py.
"""

import numpy as np


def j2t(a):
    import torch
    return torch.from_numpy(np.asarray(a, dtype=np.float32).copy())


def conv1d_to_torch(out, prefix, p):
    if "v" in p:  # weight-norm factorization
        out[prefix + ".weight_g"] = j2t(p["g"]).reshape(-1, 1, 1)
        out[prefix + ".weight_v"] = j2t(
            np.transpose(np.asarray(p["v"]), (2, 1, 0)))
    else:
        out[prefix + ".weight"] = j2t(
            np.transpose(np.asarray(p["w"]), (2, 1, 0)))
    if "b" in p:
        out[prefix + ".bias"] = j2t(p["b"])


def linear_to_torch(out, prefix, p):
    out[prefix + ".weight"] = j2t(np.asarray(p["w"]).T)
    if "b" in p:
        out[prefix + ".bias"] = j2t(p["b"])


def lstm_cell_to_torch(out, prefix, p, *, suffix=""):
    pfx = prefix + "." if prefix else ""
    out[f"{pfx}weight_ih_l0{suffix}"] = j2t(np.asarray(p["w_ih"]).T)
    out[f"{pfx}bias_ih_l0{suffix}"] = j2t(p["b_ih"])
    out[f"{pfx}bias_hh_l0{suffix}"] = j2t(p["b_hh"])
    base = f"{pfx}weight_hh_l0{suffix}"
    hh = p["hh"]
    if "sn_w" in hh:
        out[base + "_orig"] = j2t(hh["sn_w"])
        out[base + "_u"] = j2t(hh["sn_u"])
        out[base + "_v"] = j2t(hh["sn_v"])
    elif "wn_v" in hh:
        out[base + "_g"] = j2t(hh["wn_g"]).reshape(-1, 1)
        out[base + "_v"] = j2t(hh["wn_v"])
    else:
        out[base] = j2t(hh["w"])


def bilstm_to_torch(out, prefix, p):
    lstm_cell_to_torch(out, prefix, p["fwd"], suffix="")
    lstm_cell_to_torch(out, prefix, p["bwd"], suffix="_reverse")


def stacked_lstm_to_torch(out, prefix, p):
    pfx = prefix + "." if prefix else ""
    for i, layer in enumerate(p["layers"]):
        out[f"{pfx}weight_ih_l{i}"] = j2t(np.asarray(layer["w_ih"]).T)
        out[f"{pfx}bias_ih_l{i}"] = j2t(layer["b_ih"])
        out[f"{pfx}bias_hh_l{i}"] = j2t(layer["b_hh"])
        out[f"{pfx}weight_hh_l{i}"] = j2t(layer["hh"]["w"])


def inv1x1_lus_to_torch(out, prefix, p):
    pfx = prefix + "." if prefix else ""
    out[pfx + "p"] = j2t(p["p"])
    out[pfx + "lower"] = j2t(p["lower"])
    out[pfx + "upper"] = j2t(p["upper"])
    out[pfx + "upper_diag"] = j2t(p["upper_diag"])
    # constant unit-diagonal buffer the reference registers
    # (common.py:400-401); not stored in our params
    c = np.asarray(p["p"]).shape[0]
    out[pfx + "lower_diag"] = j2t(np.ones((c,), np.float32))


def inv1x1_to_torch(out, prefix, p):
    pfx = prefix + "." if prefix else ""
    out[pfx + "conv.weight"] = j2t(np.asarray(p["w1x1"])[:, :, None])


def wn_to_torch(out, prefix, p):
    pfx = prefix + "." if prefix else ""
    conv1d_to_torch(out, pfx + "start", p["start"])
    conv1d_to_torch(out, pfx + "end", p["end"])
    for i, layer in enumerate(p["in_layers"]):
        conv1d_to_torch(out, f"{pfx}in_layers.{i}.conv", layer)
    for i, layer in enumerate(p["res_skip"]):
        conv1d_to_torch(out, f"{pfx}res_skip_layers.{i}", layer)


def simple_convnet_to_torch(out, prefix, p):
    pfx = prefix + "." if prefix else ""
    for i, layer in enumerate(p["layers"]):
        conv1d_to_torch(out, f"{pfx}layers.{i}.conv", layer)
    conv1d_to_torch(out, pfx + "last_layer", p["last"])


def affine_coupling_to_torch(out, prefix, p):
    pfx = prefix + "." if prefix else ""
    if p["_meta"]["affine_model"] == "wavenet":
        wn_to_torch(out, pfx + "affine_param_predictor", p["pred"])
    else:
        simple_convnet_to_torch(out, pfx + "affine_param_predictor",
                                p["pred"])


def spline_coupling_to_torch(out, prefix, p):
    pfx = prefix + "." if prefix else ""
    simple_convnet_to_torch(out, pfx + "param_predictor", p["pred"])


def encoder_to_torch(out, prefix, p):
    pfx = prefix + "." if prefix else ""
    for i, (conv, norm) in enumerate(zip(p["convs"], p["norms"])):
        conv1d_to_torch(out, f"{pfx}convolutions.{i}.0.conv", conv)
        out[f"{pfx}convolutions.{i}.1.weight"] = j2t(norm["gamma"])
        out[f"{pfx}convolutions.{i}.1.bias"] = j2t(norm["beta"])
    bilstm_to_torch(out, pfx + "lstm", p["lstm"])


def conv_attention_to_torch(out, prefix, p):
    pfx = prefix + "." if prefix else ""
    for i, idx in enumerate((0, 2)):
        conv1d_to_torch(out, f"{pfx}key_proj.{idx}.conv", p["key_proj"][i])
    for i, idx in enumerate((0, 2, 4)):
        conv1d_to_torch(out, f"{pfx}query_proj.{idx}.conv",
                        p["query_proj"][i])


def embedding_to_torch(out, prefix, p):
    out[prefix + ".weight"] = j2t(p["table"])


def layer_norm_to_torch(out, prefix, p):
    out[prefix + ".weight"] = j2t(p["gamma"])
    out[prefix + ".bias"] = j2t(p["beta"])


# ---------------------------------------------------------------------------
# attribute predictors (mirror convert.py walkers)
# ---------------------------------------------------------------------------


def _p(prefix):
    return prefix + "." if prefix else ""


def bottleneck_to_torch(out, prefix, p):
    conv1d_to_torch(out, _p(prefix) + "projection_fn.conv", p["proj"])


def conv_lstm_linear_to_torch(out, prefix, p):
    for i, conv in enumerate(p["convs"]):
        conv1d_to_torch(out, f"{_p(prefix)}convolutions.{i}", conv)
    meta = p["_meta"]
    if meta["lstm_type"] == "bilstm":
        bilstm_to_torch(out, _p(prefix) + "bilstm", p["lstm"])
    elif meta["lstm_type"]:
        lstm_cell_to_torch(out, _p(prefix) + "bilstm", p["lstm"])
    if meta["use_linear"]:
        linear_to_torch(out, _p(prefix) + "dense", p["dense"])


def fft_to_torch(out, prefix, p):
    for i, layer in enumerate(p["layers"]):
        base = f"{_p(prefix)}layers.{i}"
        linear_to_torch(out, base + ".dec_attn.qkv_net", layer["attn"]["qkv"])
        linear_to_torch(out, base + ".dec_attn.o_net", layer["attn"]["o"])
        layer_norm_to_torch(out, base + ".dec_attn.layer_norm",
                            layer["attn"]["ln"])
        conv1d_to_torch(out, base + ".pos_ff.CoreNet.0", layer["ff"]["conv1"])
        conv1d_to_torch(out, base + ".pos_ff.CoreNet.2", layer["ff"]["conv2"])
        layer_norm_to_torch(out, base + ".pos_ff.layer_norm",
                            layer["ff"]["ln"])
    linear_to_torch(out, _p(prefix) + "dense.linear_layer", p["dense"])


def dap_to_torch(out, prefix, p):
    bottleneck_to_torch(out, _p(prefix) + "bottleneck_layer",
                        p["bottleneck"])
    if p["_meta"]["use_transformer"]:
        fft_to_torch(out, _p(prefix) + "feat_pred_fn", p["feat"])
    else:
        conv_lstm_linear_to_torch(out, _p(prefix) + "feat_pred_fn",
                                  p["feat"])


def bgap_to_torch(out, prefix, p):
    meta = p["_meta"]
    n_flows = meta["n_flows"]
    n_spline = meta["n_spline_steps"]
    bottleneck_to_torch(out, _p(prefix) + "bottleneck_layer",
                        p["bottleneck"])
    for k in range(n_flows):
        inv1x1_to_torch(out, f"{_p(prefix)}convinv.{k}", p["convinv"][k])
        if k >= n_flows - n_spline:
            spline_coupling_to_torch(out, f"{_p(prefix)}transforms.{k}",
                                     p["transforms"][k])
        else:
            affine_coupling_to_torch(out, f"{_p(prefix)}transforms.{k}",
                                     p["transforms"][k])


def ar_step_to_torch(out, prefix, p):
    lstm_cell_to_torch(out, _p(prefix) + "attr_lstm", p["attr_lstm"])
    stacked_lstm_to_torch(out, _p(prefix) + "lstm", p["lstm"])
    if p["_meta"]["has_spline"]:
        simple_convnet_to_torch(
            out, _p(prefix) + "spline_flow.param_predictor",
            p["spline_flow"]["pred"])
    else:
        for j, layer in enumerate(p["dense"]["layers"]):
            linear_to_torch(out, f"{_p(prefix)}dense_layer.layers.{j}"
                            ".linear_layer", layer)
        conv1d_to_torch(out, _p(prefix) + "conv", p["conv"])


def agap_to_torch(out, prefix, p):
    bottleneck_to_torch(out, _p(prefix) + "bottleneck_layer",
                        p["bottleneck"])
    for i, flow in enumerate(p["flows"]):
        base = (f"{_p(prefix)}flows.{i}" if i % 2 == 0
                else f"{_p(prefix)}flows.{i}.ar_step")
        ar_step_to_torch(out, base, flow)


def attribute_model_to_torch(out, prefix, p):
    name = p["_kind"]["name"]
    fn = {"dap": dap_to_torch, "bgap": bgap_to_torch,
          "agap": agap_to_torch}[name]
    fn(out, prefix, p)


# ---------------------------------------------------------------------------
# full RADTTS model
# ---------------------------------------------------------------------------


def radtts_to_torch(params):
    """params pytree -> reference-compatible state_dict (torch tensors)."""
    sd = {}
    meta = params["_meta"]
    embedding_to_torch(sd, "speaker_embedding", params["speaker_embedding"])
    embedding_to_torch(sd, "embedding", params["embedding"])
    encoder_to_torch(sd, "encoder", params["encoder"])
    if "attention" in params:
        conv_attention_to_torch(sd, "attention", params["attention"])
    if "context_lstm" in params:
        bilstm_to_torch(sd, "context_lstm", params["context_lstm"])
    if "flows" in params:
        for i, flow in enumerate(params["flows"]):
            base = f"flows.{i}"
            if meta["matrix_decomposition"] == "LUS":
                inv1x1_lus_to_torch(sd, base + ".invtbl_conv", flow["inv"])
            else:
                inv1x1_to_torch(sd, base + ".invtbl_conv", flow["inv"])
            affine_coupling_to_torch(sd, base + ".affine_tfn",
                                     flow["affine"])
    if "dur_pred_layer" in params:
        attribute_model_to_torch(sd, "dur_pred_layer",
                                 params["dur_pred_layer"])
    if "unvoiced_bias" in params:
        linear_to_torch(sd, "unvoiced_bias_module.0.linear_layer",
                        params["unvoiced_bias"])
    if "v_pred_module" in params:
        attribute_model_to_torch(sd, "v_pred_module",
                                 params["v_pred_module"])
    if "v_embeddings" in params:
        embedding_to_torch(sd, "v_embeddings", params["v_embeddings"])
    if "f0_pred_module" in params:
        attribute_model_to_torch(sd, "f0_pred_module",
                                 params["f0_pred_module"])
    if "energy_pred_module" in params:
        attribute_model_to_torch(sd, "energy_pred_module",
                                 params["energy_pred_module"])
    return sd


def export_torch_checkpoint(path, params, iteration=0, learning_rate=0.0):
    """Write a reference-format checkpoint the PyTorch implementation can
    resume/warmstart from (reference: train.py:190-197)."""
    import torch

    torch.save({"state_dict": radtts_to_torch(params),
                "iteration": iteration, "learning_rate": learning_rate},
               path)
