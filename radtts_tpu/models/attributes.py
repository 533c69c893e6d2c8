"""Attribute predictors for duration / F0 / energy / voicing.

Three families, selected per-attribute by config name (behavior parity with
reference attribute_prediction_model.py:30-326 + autoregressive_flow.py):

  * DAP  — deterministic regressor: bottleneck + ConvLSTMLinear (or
           FFTransformer) + masked regression.
  * BGAP — bipartite flow over grouped frames: [affine|spline coupling +
           invertible 1x1] stack.
  * AGAP — autoregressive flow: alternating forward/backward AR steps with
           LSTM conditioning; inference is a `lax.scan` over frames instead
           of the reference's per-frame Python loop
           (autoregressive_flow.py:195-234).

Grouping ("squeeze") uses torch nn.Unfold's channel ordering (c*g + j) so
converted reference checkpoints line up channel-for-channel.
"""

import jax
import jax.numpy as jnp
from jax import lax

from radtts_tpu.models.coupling import (affine_coupling_apply,
                                        affine_coupling_init,
                                        scaling_and_log_s, spline_ar_apply,
                                        spline_ar_init, spline_coupling_apply,
                                        spline_coupling_init)
from radtts_tpu.ops import amp
from radtts_tpu.ops.conv import (conv1d_apply, conv1d_init, conv_norm_apply,
                                 conv_norm_init)
from radtts_tpu.ops.invertible import (inv1x1_forward, inv1x1_init,
                                       inv1x1_inverse)
from radtts_tpu.ops.linear import (dense_layer_apply, dense_layer_init,
                                   linear_apply, linear_init)
from radtts_tpu.ops.lstm import (bilstm_apply, bilstm_apply_multi,
                                 bilstm_init, lstm_apply, lstm_cell_init,
                                 stacked_lstm_apply, stacked_lstm_init)
from radtts_tpu.ops.masking import sequence_mask
from radtts_tpu.ops.static import static

# ---------------------------------------------------------------------------
# grouping (reference uses nn.Unfold; channel order c*g + j)
# ---------------------------------------------------------------------------


def unfold_group(x, g):
    """x: (B, T, C) -> (B, T//g, C*g) with torch Unfold channel ordering."""
    if g == 1:
        return x
    B, T, C = x.shape
    Tg = T // g
    x = x[:, : Tg * g].reshape(B, Tg, g, C)
    x = jnp.swapaxes(x, 2, 3)  # (B, Tg, C, g)
    return x.reshape(B, Tg, C * g)


def fold_group(x, g):
    """Inverse of unfold_group. x: (B, Tg, C*g) -> (B, Tg*g, C)."""
    if g == 1:
        return x
    B, Tg, Cg = x.shape
    C = Cg // g
    x = x.reshape(B, Tg, C, g)
    x = jnp.swapaxes(x, 2, 3)  # (B, Tg, g, C)
    return x.reshape(B, Tg * g, C)


# ---------------------------------------------------------------------------
# shared bits
# ---------------------------------------------------------------------------


def attr_normalize(x, take_log):
    return jnp.log(x + 1.0) if take_log else x


def attr_denormalize(x, take_log):
    return jnp.exp(x) - 1.0 if take_log else x


def bottleneck_init(key, in_dim, reduction_factor, norm="weightnorm",
                    non_linearity="relu", kernel_size=3,
                    use_partial_padding=False):
    # use_partial_padding accepted for config parity; the reference's
    # BottleneckLayerLayer takes it but never forwards it to its conv
    # (attribute_prediction_model.py:61-77)
    reduced = int(in_dim / reduction_factor)
    p = {"proj": conv_norm_init(key, in_dim, reduced, kernel_size,
                                use_weight_norm=(norm == "weightnorm"))}
    p["_meta"] = static(reduction_factor=reduction_factor, out_dim=reduced,
                        kernel_size=kernel_size, non_linearity=non_linearity)
    return p


def bottleneck_apply(params, x):
    meta = params["_meta"]
    if meta["reduction_factor"] <= 1:
        return x
    y = conv_norm_apply(params["proj"], x, kernel_size=meta["kernel_size"])
    if meta["non_linearity"] == "leakyrelu":
        return jax.nn.leaky_relu(y, 0.01)
    return jax.nn.relu(y)


# ---------------------------------------------------------------------------
# ConvLSTMLinear backbone (reference: common.py:203-302)
# ---------------------------------------------------------------------------


def conv_lstm_linear_init(key, in_dim, out_dim, n_layers=2, n_channels=256,
                          kernel_size=3, p_dropout=0.1, lstm_type="bilstm",
                          use_linear=True):
    convs = []
    d = in_dim
    for _ in range(n_layers):
        key, sub = jax.random.split(key)
        convs.append(conv1d_init(sub, d, n_channels, kernel_size,
                                 gain_name="relu", use_weight_norm=True))
        d = n_channels
    p = {"convs": convs}
    eff_channels = n_channels if use_linear else out_dim
    if lstm_type:
        key, sub = jax.random.split(key)
        if lstm_type == "bilstm":
            p["lstm"] = bilstm_init(sub, eff_channels, eff_channels // 2,
                                    norm="spectral")
        else:
            p["lstm"] = lstm_cell_init(sub, eff_channels, eff_channels,
                                       norm="spectral")
    if use_linear:
        key, sub = jax.random.split(key)
        p["dense"] = linear_init(sub, n_channels, out_dim)
    p["_meta"] = static(kernel_size=kernel_size, lstm_type=lstm_type,
                        use_linear=bool(use_linear), p_dropout=p_dropout)
    return p


def _conv_lstm_linear_front(params, x, lens=None, *, training=False,
                            dropout_rng=None):
    """The conv stack (everything before the recurrence).

    Enters the amp bf16 region here when the scope is active: the reference
    autocasts the whole attribute predictor (train.py:364 wraps the full
    model forward; only the text encoder and 1x1 convs opt out via
    autocast(False)), so the ConvLSTMLinear convs AND the LSTM recurrence
    (weights follow x.dtype, ops/lstm.py) run half precision under AMP."""
    x = amp.cast_in(x)
    meta = params["_meta"]
    k = meta["kernel_size"]
    mask = None if lens is None else sequence_mask(lens, x.shape[1])
    mf = None if mask is None else mask.astype(x.dtype)[:, :, None]
    if mf is not None:
        x = x * mf
    for conv_p in params["convs"]:
        x = conv1d_apply(conv_p, x, padding=(k - 1) // 2)
        x = jax.nn.relu(x)
        if training and dropout_rng is not None:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - meta["p_dropout"], x.shape)
            x = jnp.where(keep, x / (1.0 - meta["p_dropout"]), 0.0)
        if mf is not None:
            x = x * mf
    return x


def conv_lstm_linear_apply(params, x, lens=None, *, training=False,
                           dropout_rng=None):
    """x: (B, T, C). Masked equivalent of the reference's per-sample conv
    loop + packed LSTM."""
    meta = params["_meta"]
    x = _conv_lstm_linear_front(params, x, lens, training=training,
                                dropout_rng=dropout_rng)
    if meta["lstm_type"]:
        if meta["lstm_type"] == "bilstm":
            x = bilstm_apply(params["lstm"], x, lens)
        else:
            x, _ = lstm_apply(params["lstm"], x, lens)
    if meta["use_linear"]:
        x = linear_apply(params["dense"], x)
    return amp.cast_out(x)


# ---------------------------------------------------------------------------
# DAP (reference: attribute_prediction_model.py:88-117)
# ---------------------------------------------------------------------------


def dap_init(key, hparams):
    k1, k2 = jax.random.split(key)
    bn = bottleneck_init(k1, **hparams["bottleneck_hparams"])
    arch = dict(hparams["arch_hparams"])
    arch["in_dim"] = bn["_meta"]["out_dim"] + hparams["n_speaker_dim"]
    use_transformer = bool(hparams.get("use_transformer", False))
    if use_transformer:
        from radtts_tpu.models.fftransformer import fft_init
        feat = fft_init(k2, **arch)
    else:
        feat = conv_lstm_linear_init(
            k2, arch["in_dim"], arch["out_dim"], n_layers=arch["n_layers"],
            n_channels=arch["n_channels"], kernel_size=arch["kernel_size"],
            p_dropout=arch["p_dropout"], lstm_type=arch.get("lstm_type",
                                                            "bilstm"),
            use_linear=bool(arch.get("use_linear", True)))
    return {"bottleneck": bn, "feat": feat,
            "_meta": static(take_log_of_input=bool(
                hparams["take_log_of_input"]),
                use_transformer=use_transformer)}


def dap_forward(params, txt_enc, spk_emb, x, lens, *, training=False,
                dropout_rng=None):
    """txt_enc: (B, T, C); spk_emb: (B, S); x: target attr (B, T) or None."""
    meta = params["_meta"]
    if x is not None:
        x = attr_normalize(x, meta["take_log_of_input"])
    h = bottleneck_apply(params["bottleneck"], txt_enc)
    spk = jnp.broadcast_to(spk_emb[:, None, :],
                           (h.shape[0], h.shape[1], spk_emb.shape[-1]))
    context = jnp.concatenate([h, spk], axis=-1)
    if meta["use_transformer"]:
        from radtts_tpu.models.fftransformer import fft_apply
        x_hat = fft_apply(params["feat"], context, lens, training=training,
                          dropout_rng=dropout_rng)
    else:
        x_hat = conv_lstm_linear_apply(params["feat"], context, lens,
                                       training=training,
                                       dropout_rng=dropout_rng)
    return {"x_hat": x_hat, "x": x}


def dap_infer(params, z, txt_enc, spk_emb, lens=None):
    out = dap_forward(params, txt_enc, spk_emb, None, lens)["x_hat"]
    return attr_denormalize(out, params["_meta"]["take_log_of_input"])


def dap_bilstm_shape(params):
    """(input_size, hidden_size) of this DAP's BiLSTM, or None when the
    model is not a fusable ConvLSTMLinear-BiLSTM DAP. Static (trace-time)."""
    if params.get("_kind", {}).get("name") != "dap":
        return None
    if params["_meta"]["use_transformer"]:
        return None
    feat = params["feat"]
    if feat["_meta"]["lstm_type"] != "bilstm":
        return None
    cell = feat["lstm"]["fwd"]
    return (cell["w_ih"].shape[0], cell["w_ih"].shape[1] // 4)


def dap_forward_fused(params_list, txt_list, spk_list, x_list, lens=None, *,
                      training=False, rng_list=None):
    """Training-forward counterpart of dap_infer_fused: M fusable DAPs with
    ONE BiLSTM scan. Per-model conv fronts keep their own dropout rngs;
    outputs match [dap_forward(...) for ...] exactly."""
    fronts, norm_x = [], []
    for m, (p, txt, spk) in enumerate(zip(params_list, txt_list, spk_list)):
        x = x_list[m]
        if x is not None:
            x = attr_normalize(x, p["_meta"]["take_log_of_input"])
        norm_x.append(x)
        h = bottleneck_apply(p["bottleneck"], txt)
        spk_b = jnp.broadcast_to(spk[:, None, :],
                                 (h.shape[0], h.shape[1], spk.shape[-1]))
        context = jnp.concatenate([h, spk_b], axis=-1)
        rng = None if rng_list is None else rng_list[m]
        fronts.append(_conv_lstm_linear_front(p["feat"], context, lens,
                                              training=training,
                                              dropout_rng=rng))
    lstm_outs = bilstm_apply_multi([p["feat"]["lstm"] for p in params_list],
                                   fronts, lens)
    outs = []
    for p, y, x in zip(params_list, lstm_outs, norm_x):
        if p["feat"]["_meta"]["use_linear"]:
            y = linear_apply(p["feat"]["dense"], y)
        outs.append({"x_hat": amp.cast_out(y), "x": x})
    return outs


def dap_infer_fused(params_list, txt_list, spk_list, lens=None):
    """Infer M DAP models whose BiLSTMs share shapes with ONE fused scan.

    Equivalent to [dap_infer(p, None, t, s, lens) for ...] — the conv fronts
    and dense heads stay per-model; only the recurrences (the serial part)
    are batched together (see ops/lstm.bilstm_apply_multi). Used by
    radtts_infer to overlap the f0 and energy predictors
    (reference runs them back to back: radtts.py:605-625)."""
    fronts = []
    for p, txt, spk in zip(params_list, txt_list, spk_list):
        h = bottleneck_apply(p["bottleneck"], txt)
        spk_b = jnp.broadcast_to(spk[:, None, :],
                                 (h.shape[0], h.shape[1], spk.shape[-1]))
        context = jnp.concatenate([h, spk_b], axis=-1)
        fronts.append(_conv_lstm_linear_front(p["feat"], context, lens))
    lstm_outs = bilstm_apply_multi([p["feat"]["lstm"] for p in params_list],
                                   fronts, lens)
    outs = []
    for p, y in zip(params_list, lstm_outs):
        if p["feat"]["_meta"]["use_linear"]:
            y = linear_apply(p["feat"]["dense"], y)
        outs.append(attr_denormalize(amp.cast_out(y),
                                     p["_meta"]["take_log_of_input"]))
    return outs


# ---------------------------------------------------------------------------
# BGAP (reference: attribute_prediction_model.py:120-224)
# ---------------------------------------------------------------------------


def bgap_init(key, hparams):
    h = hparams
    g = h["n_group_size"]
    k_bn, key = jax.random.split(key)
    bn = bottleneck_init(k_bn, **h["bottleneck_hparams"])
    n_txt_reduced = bn["_meta"]["out_dim"]
    context_dim = n_txt_reduced * g + h["n_speaker_dim"]
    n_flows = h["n_flows"]
    n_spline = h.get("n_spline_steps", 2)
    transforms, convinv = [], []
    for k_idx in range(n_flows):
        key, k1, k2 = jax.random.split(key, 3)
        convinv.append(inv1x1_init(k1, h["n_in_dim"] * g))
        if k_idx >= n_flows - n_spline:
            transforms.append(spline_coupling_init(
                k2, h["n_in_dim"] * g, context_dim, h["n_layers"],
                with_dilation=h["with_dilation"],
                kernel_size=h["kernel_size"], n_bins=h.get("n_bins", 8),
                left=-3, right=3, bottom=-3, top=3,
                use_quadratic=h.get("use_quadratic", False)))
        else:
            transforms.append(affine_coupling_init(
                k2, h["n_in_dim"] * g, context_dim, h["n_layers"],
                affine_model="simple_conv",
                with_dilation=h["with_dilation"],
                kernel_size=h["kernel_size"],
                n_hidden=h.get("n_channels", 1024)))
    return {"bottleneck": bn, "transforms": transforms, "convinv": convinv,
            "_meta": static(n_flows=n_flows, n_group_size=g,
                            n_spline_steps=n_spline,
                            scaling_fn=h["scaling_fn"],
                            take_log_of_input=bool(
                                h.get("take_log_of_input", False)))}


def _bgap_context(params, txt_enc, spk_emb, g):
    h = bottleneck_apply(params["bottleneck"], txt_enc)
    h = unfold_group(h, g)
    spk = jnp.broadcast_to(spk_emb[:, None, :],
                           (h.shape[0], h.shape[1], spk_emb.shape[-1]))
    return jnp.concatenate([h, spk], axis=-1)


def bgap_forward(params, txt_enc, spk_emb, x, lens, **_unused):
    meta = params["_meta"]
    g = meta["n_group_size"]
    n_flows = meta["n_flows"]
    if x.ndim == 2:
        x = x[:, :, None]
    context = _bgap_context(params, txt_enc, spk_emb, g)
    lens_grouped = lens // g
    mask = sequence_mask(lens_grouped, context.shape[1])
    x = unfold_group(x, g)
    log_s_list, log_det_W_list = [], []
    for k_idx in range(n_flows):
        if k_idx >= n_flows - meta["n_spline_steps"]:
            x, log_s = spline_coupling_apply(params["transforms"][k_idx], x,
                                             context, mask=mask)
        else:
            x, log_s = affine_coupling_apply(
                params["transforms"][k_idx], x, context,
                scaling_fn=meta["scaling_fn"], mask=mask)
        x, log_det_W = inv1x1_forward(params["convinv"][k_idx], x)
        log_det_W_list.append(log_det_W)
        log_s_list.append(log_s)
    return {"z": x, "log_det_W_list": log_det_W_list,
            "log_s_list": log_s_list}


def bgap_infer(params, z, txt_enc, spk_emb, seq_lens=None):
    meta = params["_meta"]
    g = meta["n_group_size"]
    n_flows = meta["n_flows"]
    context = _bgap_context(params, txt_enc, spk_emb, g)
    if seq_lens is None:
        # duration-model inference path has no lens (reference calls
        # dur_pred_layer.infer without them, radtts.py:562): full length
        seq_lens = jnp.full((z.shape[0],), txt_enc.shape[1], jnp.int32)
    lens_grouped = seq_lens // g
    mask = sequence_mask(lens_grouped, context.shape[1])
    z = unfold_group(z, g)
    for k_idx in reversed(range(n_flows)):
        z = inv1x1_inverse(params["convinv"][k_idx], z)
        if k_idx >= n_flows - meta["n_spline_steps"]:
            z = spline_coupling_apply(params["transforms"][k_idx], z, context,
                                      mask=mask, inverse=True)
        else:
            z = affine_coupling_apply(
                params["transforms"][k_idx], z, context,
                scaling_fn=meta["scaling_fn"], mask=mask, inverse=True)
    return fold_group(z, g)


# ---------------------------------------------------------------------------
# AGAP (reference: attribute_prediction_model.py:227-326 +
# autoregressive_flow.py:49-234)
# ---------------------------------------------------------------------------


def ar_step_init(key, n_attr_channels, n_speaker_dim, n_text_channels,
                 n_hidden, n_lstm_layers, spline_flow_params=None):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    p = {
        "attr_lstm": lstm_cell_init(k1, n_attr_channels, n_hidden),
        "lstm": stacked_lstm_init(
            k2, n_hidden + n_text_channels + n_speaker_dim, n_hidden,
            n_lstm_layers),
    }
    if spline_flow_params is not None:
        p["spline_flow"] = spline_ar_init(
            k3, spline_flow_params["n_in_channels"],
            spline_flow_params["n_context_dim"],
            spline_flow_params["n_layers"],
            n_bins=spline_flow_params.get("n_bins", 8),
            use_quadratic=spline_flow_params.get("use_quadratic", False))
        has_spline = True
    else:
        p["dense"] = dense_layer_init(k4, n_hidden, [n_hidden, n_hidden])
        p["conv"] = conv1d_init(k5, n_hidden, 2 * n_attr_channels, 1,
                                zero_init=True)
        has_spline = False
    p["_meta"] = static(n_attr=n_attr_channels, has_spline=has_spline)
    return p


def _ar_step_params_out(params, lstm_hidden):
    """dense tanh MLP + zero-init 1x1 conv -> (scale_raw, bias)."""
    h = dense_layer_apply(params["dense"], lstm_hidden)
    out = conv1d_apply(params["conv"], h)
    n = out.shape[-1] // 2
    return out[..., :n], out[..., n:]


def ar_step_forward(params, x, context, lens, scaling_fn):
    """x, context: (B, T, C). Returns (z, log_s)."""
    meta = params["_meta"]
    x0 = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
    mel_hidden, _ = lstm_apply(params["attr_lstm"], x0, lens)
    dec_in = jnp.concatenate([mel_hidden, context], axis=-1)
    lstm_hidden, _ = stacked_lstm_apply(params["lstm"], dec_in, lens)
    if meta["has_spline"]:
        z, log_s = spline_ar_apply(params["spline_flow"], x, lstm_hidden)
        return z, log_s
    scale_raw, bias = _ar_step_params_out(params, lstm_hidden)
    s, log_s = scaling_and_log_s(scale_raw, scaling_fn)
    return s * x + bias, log_s


def ar_step_infer(params, residual, context, scaling_fn):
    """Sequential inverse as one lax.scan over frames.
    residual, context: (B, T, C)."""
    meta = params["_meta"]
    B = residual.shape[0]
    n_hidden = params["attr_lstm"]["b_ih"].shape[0] // 4
    n_layers = len(params["lstm"]["layers"])

    res_t = jnp.swapaxes(residual, 0, 1)  # (T, B, C)
    ctx_t = jnp.swapaxes(context, 0, 1)

    h0 = jnp.zeros((B, n_hidden), residual.dtype)
    carries0 = {
        "prev": jnp.zeros((B, residual.shape[-1]), residual.dtype),
        "attr": (h0, h0),
        "lstm": [(h0, h0) for _ in range(n_layers)],
    }

    def step(carry, inp):
        res_i, ctx_i = inp
        prev = carry["prev"][:, None, :]  # (B, 1, C)
        mel_hidden, attr_hc = lstm_apply(
            params["attr_lstm"], prev, None,
            h0=carry["attr"][0], c0=carry["attr"][1])
        dec_in = jnp.concatenate([mel_hidden, ctx_i[:, None, :]], axis=-1)
        lstm_hidden, lstm_hcs = stacked_lstm_apply(
            params["lstm"], dec_in, None, carries=carry["lstm"])
        if meta["has_spline"]:
            out = spline_ar_apply(params["spline_flow"], res_i[:, None, :],
                                  lstm_hidden, inverse=True)[:, 0]
        else:
            scale_raw, bias = _ar_step_params_out(params, lstm_hidden)
            s, _ = scaling_and_log_s(scale_raw, scaling_fn)
            out = ((res_i[:, None, :] - bias) / s)[:, 0]
        new_carry = {"prev": out, "attr": attr_hc, "lstm": lstm_hcs}
        return new_carry, out

    _, outs = lax.scan(step, carries0, (res_t, ctx_t))
    return jnp.swapaxes(outs, 0, 1)


def agap_init(key, hparams):
    h = hparams
    g = h.get("n_group_size", 1)
    k_bn, key = jax.random.split(key)
    bn = bottleneck_init(k_bn, **h["bottleneck_hparams"])
    n_txt_reduced = bn["_meta"]["out_dim"]
    spline_params = h.get("spline_flow_params")
    if spline_params is not None:
        spline_params = dict(spline_params)
        spline_params["n_in_channels"] = spline_params["n_in_channels"] * g
    flows = []
    for i in range(h["n_flows"]):
        key, sub = jax.random.split(key)
        flows.append(ar_step_init(
            sub, h["n_in_dim"] * g, h["n_speaker_dim"], n_txt_reduced * g,
            h["n_hidden"], h["n_lstm_layers"],
            spline_flow_params=spline_params))
    return {"bottleneck": bn, "flows": flows,
            "_meta": static(n_flows=h["n_flows"], n_group_size=g,
                            scaling_fn=h["scaling_fn"],
                            take_log_of_input=bool(
                                h.get("take_log_of_input", False)))}


def _agap_context(params, txt_enc, spk_emb, g):
    h = bottleneck_apply(params["bottleneck"], txt_enc)
    h = unfold_group(h, g)
    spk = jnp.broadcast_to(spk_emb[:, None, :],
                           (h.shape[0], h.shape[1], spk_emb.shape[-1]))
    return jnp.concatenate([h, spk], axis=-1)


def agap_forward(params, txt_enc, spk_emb, x, lens, **_unused):
    meta = params["_meta"]
    g = meta["n_group_size"]
    if x.ndim == 2:
        x = x[:, :, None]
    x = unfold_group(x, g)
    x = attr_normalize(x, meta["take_log_of_input"])
    context = _agap_context(params, txt_enc, spk_emb, g)
    lens_grouped = lens // g
    log_s_list = []
    for i, flow_p in enumerate(params["flows"]):
        if i % 2 == 0:
            x, log_s = ar_step_forward(flow_p, x, context, lens_grouped,
                                       meta["scaling_fn"])
        else:
            xr = _flip_roll(x, lens_grouped)
            cr = _flip_roll(context, lens_grouped)
            xr, log_s_r = ar_step_forward(flow_p, xr, cr, lens_grouped,
                                          meta["scaling_fn"])
            x = _flip_roll(xr, lens_grouped)
            log_s = _flip_roll(log_s_r, lens_grouped)
        log_s_list.append(log_s)
    return {"z": x, "log_s_list": log_s_list, "log_det_W_list": []}


def _flip_roll(x, lens):
    """Reference AR_Back_Step's flip+roll (autoregressive_flow.py:57-71) ==
    per-sample reversal of the valid prefix."""
    from radtts_tpu.ops.lstm import reverse_padded
    valid = sequence_mask(lens, x.shape[1])
    return reverse_padded(x, lens) * valid[:, :, None].astype(x.dtype)


def agap_infer(params, z, txt_enc, spk_emb, seq_lens=None):
    """seq_lens (frames, pre-grouping) makes padded batches exact: back-step
    reversals flip each sample's VALID prefix (as training does via
    _flip_roll) instead of the padded axis, so every causal scan sees valid
    frames first and per-item outputs match the exact-length run
    (reference back step: autoregressive_flow.py:57-71; its inference is
    B=1 exact-length where flip == prefix-flip)."""
    meta = params["_meta"]
    g = meta["n_group_size"]
    n_frames = z.shape[1]
    z = unfold_group(z, g)
    context = _agap_context(params, txt_enc, spk_emb, g)
    lens_grouped = None if seq_lens is None else seq_lens // g

    def rev(t):
        if lens_grouped is None:
            return jnp.flip(t, axis=1)
        return _flip_roll(t, lens_grouped)

    for i in reversed(range(meta["n_flows"])):
        flow_p = params["flows"][i]
        if i % 2 == 0:
            z = ar_step_infer(flow_p, z, context, meta["scaling_fn"])
        else:
            zr = rev(z)
            cr = rev(context)
            zr = ar_step_infer(flow_p, zr, cr, meta["scaling_fn"])
            z = rev(zr)
    x_hat = fold_group(z, g)
    if x_hat.shape[1] < n_frames:  # group-size truncation: reflect pad
        pad = n_frames - x_hat.shape[1]
        x_hat = jnp.concatenate(
            [x_hat, jnp.flip(x_hat[:, -pad - 1:-1], axis=1)], axis=1)
    return attr_denormalize(x_hat, meta["take_log_of_input"])


# ---------------------------------------------------------------------------
# factory (reference: attribute_prediction_model.py:30-42)
# ---------------------------------------------------------------------------

_INITS = {"dap": dap_init, "bgap": bgap_init, "agap": agap_init}


def attribute_model_init(key, config):
    name = config["name"]
    if name not in _INITS:
        raise ValueError(f"{name} model is not supported")
    params = _INITS[name](key, config["hparams"])
    params["_kind"] = static(name=name)
    return params


def attribute_model_forward(params, txt_enc, spk_emb, x, lens, *,
                            training=False, dropout_rng=None):
    name = params["_kind"]["name"]
    if name == "dap":
        return dap_forward(params, txt_enc, spk_emb, x, lens,
                           training=training, dropout_rng=dropout_rng)
    if name == "bgap":
        return bgap_forward(params, txt_enc, spk_emb, x, lens)
    return agap_forward(params, txt_enc, spk_emb, x, lens)


def attribute_model_infer(params, z, txt_enc, spk_emb, lens=None):
    name = params["_kind"]["name"]
    if name == "dap":
        return dap_infer(params, z, txt_enc, spk_emb, lens)
    if name == "bgap":
        return bgap_infer(params, z, txt_enc, spk_emb, lens)
    return agap_infer(params, z, txt_enc, spk_emb, lens)
