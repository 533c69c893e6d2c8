"""RADTTS top-level model: speaker/text embedding, alignment attention,
bipartite flow mel decoder with early exits, and attribute predictor
orchestration (behavior parity with reference radtts.py:62-750).

TPU-first design points:
  * channels-last (B, T, C); grouping via reshape/transpose (no nn.Unfold);
  * MAS on device (vmapped scan) with straight-through estimator;
  * inference split into a duration stage and a static-shape decode stage so
    XLA compiles one program per (text-bucket, frame-bucket) pair;
  * inverse 1x1 weights precomputed into the params pytree
    (ops.invertible.precompute_inverses) instead of mutable caching.
"""

import jax
import jax.numpy as jnp

from radtts_tpu.models.attention import (conv_attention_apply,
                                         conv_attention_init)
from radtts_tpu.models.attributes import (attribute_model_forward,
                                          attribute_model_infer,
                                          attribute_model_init, fold_group,
                                          unfold_group)
from radtts_tpu.models.coupling import affine_coupling_apply, \
    affine_coupling_init
from radtts_tpu.models.encoder import encoder_apply, encoder_init
from radtts_tpu.ops.invertible import (inv1x1_forward, inv1x1_init,
                                       inv1x1_inverse, inv1x1_lus_forward,
                                       inv1x1_lus_init, inv1x1_lus_inverse)
from radtts_tpu.ops.length_regulator import regulate_length
from radtts_tpu.ops.linear import linear_apply, linear_init
from radtts_tpu.ops.lstm import bilstm_apply, bilstm_init
from radtts_tpu.ops.mas import mas_width1
from radtts_tpu.ops.masking import sequence_mask
from radtts_tpu.ops.static import static

# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def radtts_init(key, model_config):
    """Build the params pytree from a reference-format model_config dict
    (reference: radtts.py:63-238 constructor semantics, including implicit
    kwargs defaults).

    Init runs on the host CPU backend: it is hundreds of tiny eager ops, and
    dispatching those one-by-one to a (possibly remote) TPU is pathologically
    slow. Arrays move to the accelerator lazily on first use."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            return _radtts_init_impl(key, model_config)
    return _radtts_init_impl(key, model_config)


def radtts_template(model_config):
    """radtts_init's tree with ShapeDtypeStruct leaves (jax.eval_shape) —
    structure, shapes, dtypes, and Static `_meta` nodes are all concrete,
    only the array VALUES are absent. For checkpoint loading where every
    leaf is about to be overwritten anyway: the real init eagerly runs
    thousands of tiny host ops (QR orthogonal inits, norm factorizations,
    LSTM stacks) that cost minutes at flagship scale, where the traced
    shape pass takes seconds (measured 109 s vs 3.8 s)."""
    return jax.eval_shape(lambda k: radtts_init(k, model_config),
                          jax.random.PRNGKey(0))


def _radtts_init_impl(key, model_config):
    cfg = dict(model_config)
    g = lambda name, default=None: cfg.get(name, default)

    n_speakers = cfg["n_speakers"]
    n_speaker_dim = cfg["n_speaker_dim"]
    n_text = cfg["n_text"]
    n_text_dim = cfg["n_text_dim"]
    n_flows = cfg["n_flows"]
    n_conv_layers = cfg["n_conv_layers_per_step"]
    n_mel = cfg["n_mel_channels"]
    n_hidden = cfg["n_hidden"]
    n_early_size = cfg["n_early_size"]
    n_early_every = cfg["n_early_every"]
    n_group_size = cfg["n_group_size"]
    include_modules = g("include_modules", "dec")
    n_f0_dims = g("n_f0_dims", 0)
    n_energy_dims = g("n_energy_avg_dims", 0)
    use_context_lstm = bool(g("use_context_lstm", False))
    context_lstm_w_f0_and_energy = g("context_lstm_w_f0_and_energy", True)
    decoder_use_unvoiced_bias = g("decoder_use_unvoiced_bias", True)
    ap_use_unvoiced_bias = g("ap_use_unvoiced_bias", True)
    ap_use_voiced_embeddings = g("ap_use_voiced_embeddings", True)
    unvoiced_bias_activation = g("unvoiced_bias_activation", "")

    params = {}
    key, k_spk, k_txt, k_enc = jax.random.split(key, 4)
    params["speaker_embedding"] = {
        "table": jax.random.normal(k_spk, (n_speakers, n_speaker_dim))}
    params["embedding"] = {
        "table": jax.random.normal(k_txt, (n_text, n_text_dim))}
    params["encoder"] = encoder_init(
        k_enc, encoder_embedding_dim=n_text_dim,
        lstm_norm=_norm_kind(g("text_encoder_lstm_norm")))

    has_dec = "dec" in include_modules
    has_atn = "atn" in include_modules or has_dec

    if has_atn and g("learn_alignments", False):
        key, k_attn = jax.random.split(key)
        attn_in = n_text_dim + (n_speaker_dim
                                if g("use_speaker_emb_for_alignment", False)
                                else 0)
        params["attention"] = conv_attention_init(k_attn, n_mel, attn_in)

    n_flowstep_cond_dims = (
        n_speaker_dim + (n_text_dim + n_f0_dims + n_energy_dims)
        * n_group_size)
    if use_context_lstm:
        n_in_context_lstm = n_speaker_dim + n_text_dim * n_group_size
        n_context_lstm_hidden = int(
            (n_speaker_dim + n_text_dim * n_group_size) / 2)
        if context_lstm_w_f0_and_energy:
            n_in_context_lstm = (n_f0_dims + n_energy_dims + n_text_dim)
            n_in_context_lstm *= n_group_size
            n_in_context_lstm += n_speaker_dim
            n_flowstep_cond_dims = (
                n_speaker_dim + n_text_dim * n_group_size)
        key, k_ctx = jax.random.split(key)
        params["context_lstm"] = bilstm_init(
            k_ctx, n_in_context_lstm, n_context_lstm_hidden,
            norm=_norm_kind(g("context_lstm_norm")))

    exit_steps = []
    flow_channels = []
    if has_dec:
        ch = n_mel * n_group_size
        flows = []
        for i in range(n_flows):
            if i > 0 and i % n_early_every == 0:
                ch -= n_early_size
                exit_steps.append(i)
            key, k1, k2 = jax.random.split(key, 3)
            if g("matrix_decomposition", "") == "LUS":
                inv = inv1x1_lus_init(k1, ch)
            else:
                inv = inv1x1_init(k1, ch)
            # the reference hardcodes the WN predictor width to 1024
            # independent of n_hidden (common.py:750 n_channels=1024);
            # affine_n_channels is our explicit override for small models
            affine = affine_coupling_init(
                k2, ch, n_flowstep_cond_dims, n_conv_layers,
                affine_model=g("affine_model", "simple_conv"),
                n_hidden=g("affine_n_channels", 1024))
            flows.append({"inv": inv, "affine": affine})
            flow_channels.append(ch)
        params["flows"] = flows

    if "dpm" in include_modules:
        dmc = dict(cfg["dur_model_config"])
        dmc["hparams"] = dict(dmc["hparams"],
                              n_speaker_dim=n_speaker_dim)
        key, sub = jax.random.split(key)
        params["dur_pred_layer"] = attribute_model_init(sub, dmc)

    use_unvoiced_bias = bool(decoder_use_unvoiced_bias or
                             ap_use_unvoiced_bias)
    if use_unvoiced_bias:
        assert unvoiced_bias_activation in {"relu", "exp"}
        key, sub = jax.random.split(key)
        params["unvoiced_bias"] = linear_init(sub, n_text_dim, 1)

    use_vpred_module = bool(ap_use_voiced_embeddings or use_unvoiced_bias
                            or "vpred" in include_modules)
    if use_vpred_module:
        vmc = dict(cfg["v_model_config"])
        vmc["hparams"] = dict(vmc["hparams"], n_speaker_dim=n_speaker_dim)
        key, sub = jax.random.split(key)
        params["v_pred_module"] = attribute_model_init(sub, vmc)
        if ap_use_voiced_embeddings:
            key, sub = jax.random.split(key)
            params["v_embeddings"] = {
                "table": jax.random.normal(sub, (4, n_text_dim))}

    if "apm" in include_modules:
        use_fof = bool(g("use_first_order_features", False))
        for name in ("f0_model_config", "energy_model_config"):
            mc = dict(cfg[name])
            hp = dict(mc["hparams"], n_speaker_dim=n_speaker_dim)
            if use_fof:
                hp["n_in_dim"] = 2
                if hp.get("spline_flow_params") is not None:
                    hp["spline_flow_params"] = dict(
                        hp["spline_flow_params"], n_in_channels=2)
            else:
                if hp.get("spline_flow_params") is not None:
                    hp["spline_flow_params"] = dict(
                        hp["spline_flow_params"],
                        n_in_channels=hp["n_in_dim"])
            mc["hparams"] = hp
            key, sub = jax.random.split(key)
            tgt = ("f0_pred_module" if name.startswith("f0")
                   else "energy_pred_module")
            params[tgt] = attribute_model_init(sub, mc)

    params["_meta"] = static(
        n_mel_channels=n_mel,
        n_speaker_dim=n_speaker_dim,
        n_text_dim=n_text_dim,
        n_flows=n_flows,
        n_group_size=n_group_size,
        n_early_size=n_early_size,
        exit_steps=tuple(exit_steps),
        flow_channels=tuple(flow_channels),
        include_modules=include_modules,
        scaling_fn=g("scaling_fn", "exp"),
        affine_activation=g("affine_activation", "softplus"),
        matrix_decomposition=g("matrix_decomposition", ""),
        learn_alignments=bool(g("learn_alignments", False)),
        use_speaker_emb_for_alignment=bool(
            g("use_speaker_emb_for_alignment", False)),
        attn_straight_through_estimator=bool(
            g("attn_straight_through_estimator", False)),
        use_context_lstm=use_context_lstm,
        context_lstm_w_f0_and_energy=bool(context_lstm_w_f0_and_energy),
        n_f0_dims=n_f0_dims,
        n_energy_avg_dims=n_energy_dims,
        use_first_order_features=bool(g("use_first_order_features", False)),
        decoder_use_unvoiced_bias=bool(decoder_use_unvoiced_bias),
        ap_use_unvoiced_bias=bool(ap_use_unvoiced_bias),
        ap_use_voiced_embeddings=bool(ap_use_voiced_embeddings),
        ap_pred_log_f0=bool(g("ap_pred_log_f0", False)),
        unvoiced_bias_activation=unvoiced_bias_activation,
        use_unvoiced_bias=use_unvoiced_bias,
        use_vpred_module=use_vpred_module,
        dummy_speaker_embedding=bool(g("dummy_speaker_embedding", False)),
        do_mel_descaling=bool(g("do_mel_descaling", True)),
        decoder_use_partial_padding=bool(
            g("decoder_use_partial_padding", True)),
    )
    return params


def _norm_kind(name):
    if name is None:
        return None
    if "spectral" in name:
        return "spectral"
    if "weight" in name:
        return "weight"
    return None


# ---------------------------------------------------------------------------
# shared sub-computations
# ---------------------------------------------------------------------------


def encode_speaker(params, spk_ids):
    meta = params["_meta"]
    if meta["dummy_speaker_embedding"]:
        spk_ids = spk_ids * 0
    return params["speaker_embedding"]["table"][spk_ids]


def encode_text(params, text, in_lens, *, training=False, dropout_rng=None):
    emb = params["embedding"]["table"][text]  # (B, N, C)
    enc = encoder_apply(params["encoder"], emb, in_lens, training=training,
                        dropout_rng=dropout_rng)
    return enc, emb


def apply_voice_mask_to_text(params, text_enc, voiced_mask):
    """(reference: radtts.py:351-363) gate attn-expanded text features by the
    voicing decision via learned scale/bias embeddings."""
    table = params["v_embeddings"]["table"]  # (4, C)
    vm = voiced_mask[:, :, None]
    scale = jax.nn.sigmoid(table[0][None, None] * vm
                           + table[1][None, None] * (1 - vm))
    bias = 0.1 * jnp.tanh(table[2][None, None] * vm
                          + table[3][None, None] * (1 - vm))
    return text_enc * scale + bias


def _unvoiced_bias(params, meta, context, voiced_mask):
    raw = linear_apply(params["unvoiced_bias"], context)[..., 0]
    if meta["unvoiced_bias_activation"] == "exp":
        raw = jnp.exp(raw)
    else:
        raw = jax.nn.relu(raw)
    return -raw * (1.0 - voiced_mask)


def preprocess_context(params, context, speaker_vecs, out_lens=None, f0=None,
                       energy_avg=None):
    """(reference: radtts.py:262-302) group context, append speaker (and
    optionally f0/energy), optionally run the bidirectional context LSTM."""
    meta = params["_meta"]
    g = meta["n_group_size"]
    context = unfold_group(context, g)
    if f0 is not None:
        f0 = unfold_group(f0[:, :, None], g)
    if energy_avg is not None:
        energy_avg = unfold_group(energy_avg[:, :, None], g)
    B, Tg, _ = context.shape
    spk = jnp.broadcast_to(speaker_vecs[:, None, :],
                           (B, Tg, speaker_vecs.shape[-1]))
    ctx = jnp.concatenate([context, spk], axis=-1)

    if meta["use_context_lstm"]:
        if meta["context_lstm_w_f0_and_energy"]:
            if f0 is not None:
                ctx = jnp.concatenate([ctx, f0], axis=-1)
            if energy_avg is not None:
                ctx = jnp.concatenate([ctx, energy_avg], axis=-1)
        lens_g = None if out_lens is None else out_lens // g
        # under AMP the context LSTM runs bf16 like the reference's
        # autocast does (train.py:364 covers it; torch LSTMs autocast to
        # half) — weights follow the activation dtype in ops/lstm.py
        from radtts_tpu.ops import amp as _amp
        ctx = _amp.cast_out(
            bilstm_apply(params["context_lstm"], _amp.cast_in(ctx), lens_g))

    if not meta["context_lstm_w_f0_and_energy"]:
        if f0 is not None:
            ctx = jnp.concatenate([ctx, f0], axis=-1)
        if energy_avg is not None:
            ctx = jnp.concatenate([ctx, energy_avg], axis=-1)
    return ctx


def binarize_attention(attn_soft, in_lens, out_lens):
    from radtts_tpu.debug import check_finite
    attn_soft = check_finite(attn_soft, "soft attention map")
    return jax.lax.stop_gradient(
        mas_width1(jax.lax.stop_gradient(attn_soft), out_lens, in_lens))


def get_first_order_features(feats, dilation=1):
    """(reference: radtts.py:336-349) symmetric first differences."""
    zeros = jnp.zeros_like(feats[:, 0:dilation])
    ext_r = jnp.concatenate([feats, zeros], axis=1)
    ext_l = jnp.concatenate([zeros, feats], axis=1)
    dr = ext_r[:, dilation:] - feats
    dl = feats - ext_l[:, 0:feats.shape[1]]
    return (dr + dl) * 0.5


def is_attribute_unconditional(meta):
    return meta["n_f0_dims"] == 0 and meta["n_energy_avg_dims"] == 0


def _flow_step_forward(params, flow_p, ch, z, context, mask):
    meta = params["_meta"]
    if meta["matrix_decomposition"] == "LUS":
        z, log_det_W = inv1x1_lus_forward(flow_p["inv"], z)
    else:
        z, log_det_W = inv1x1_forward(flow_p["inv"], z)
    z, log_s = affine_coupling_apply(
        flow_p["affine"], z, context, scaling_fn=meta["scaling_fn"],
        affine_activation=meta["affine_activation"], mask=mask,
        use_partial_padding=meta["decoder_use_partial_padding"])
    from radtts_tpu.debug import check_finite
    log_s = check_finite(log_s, "decoder flow log_s")
    log_det_W = check_finite(log_det_W, "decoder flow log_det_W")
    return z, log_det_W, log_s


def _flow_step_inverse(params, flow_p, z, context, mask):
    meta = params["_meta"]
    z = affine_coupling_apply(
        flow_p["affine"], z, context, scaling_fn=meta["scaling_fn"],
        affine_activation=meta["affine_activation"], mask=mask,
        use_partial_padding=meta["decoder_use_partial_padding"],
        inverse=True)
    if meta["matrix_decomposition"] == "LUS":
        return inv1x1_lus_inverse(flow_p["inv"], z)
    return inv1x1_inverse(flow_p["inv"], z)


# ---------------------------------------------------------------------------
# training forward (reference: radtts.py:365-539)
# ---------------------------------------------------------------------------


def radtts_forward(params, mel, speaker_ids, text, in_lens, out_lens, *,
                   binarize_attention_flag=False, attn_prior=None, f0=None,
                   energy_avg=None, voiced_mask=None, p_voiced=None,
                   training=False, dropout_rng=None):
    """mel: (B, T, n_mel); text: (B, N) int; returns outputs dict."""
    meta = params["_meta"]
    rngs = {}
    if dropout_rng is not None:
        for name in ("enc", "dur", "f0", "energy", "vpred"):
            dropout_rng, sub = jax.random.split(dropout_rng)
            rngs[name] = sub
    speaker_vecs = encode_speaker(params, speaker_ids)
    text_enc, text_emb = encode_text(params, text, in_lens,
                                     training=training,
                                     dropout_rng=rngs.get("enc"))

    outputs = {
        "z_mel": None, "log_det_W_list": [], "log_s_list": [],
        "duration_model_outputs": None, "f0_model_outputs": None,
        "energy_model_outputs": None, "vpred_model_outputs": None,
        "attn_soft": None, "attn": None, "text_embeddings": text_emb,
        "attn_logprob": None,
    }

    attn = attn_soft = attn_hard = context = None
    include = meta["include_modules"]
    if "atn" in include or "dec" in include:
        keys = text_emb
        if meta["use_speaker_emb_for_alignment"]:
            spk_expd = jnp.broadcast_to(
                jax.lax.stop_gradient(speaker_vecs)[:, None, :],
                (keys.shape[0], keys.shape[1], speaker_vecs.shape[-1]))
            keys = jnp.concatenate([keys, spk_expd], axis=-1)
        attn_soft, attn_logprob = conv_attention_apply(
            params["attention"], mel, keys, in_lens, attn_prior=attn_prior)
        outputs["attn_soft"] = attn_soft
        outputs["attn_logprob"] = attn_logprob

        if binarize_attention_flag:
            attn = binarize_attention(attn_soft, in_lens, out_lens)
            attn_hard = attn
            if meta["attn_straight_through_estimator"]:
                attn_hard = attn_soft + jax.lax.stop_gradient(
                    attn_hard - attn_soft)
            attn = attn_hard
        else:
            attn = attn_soft
        outputs["attn"] = attn
        context = jnp.einsum("btn,bnc->btc", attn, text_enc)

    f0_bias = 0.0
    if meta["use_unvoiced_bias"]:
        f0_bias = _unvoiced_bias(params, meta, context, voiced_mask)

    if "dec" in include:
        g = meta["n_group_size"]
        mel_g = unfold_group(mel, g)
        if f0 is None:
            f0_aug = None
        elif meta["decoder_use_unvoiced_bias"]:
            f0_aug = f0 * voiced_mask + f0_bias
        else:
            f0_aug = f0 * voiced_mask

        ctx = preprocess_context(params, context, speaker_vecs, out_lens,
                                 f0_aug, energy_avg)
        lens_g = out_lens // g
        mask_g = sequence_mask(lens_g, mel_g.shape[1])

        z_out, log_s_list, log_det_W_list = [], [], []
        n_early = meta["n_early_size"]
        for i, flow_p in enumerate(params["flows"]):
            if i in meta["exit_steps"]:
                z_out.append(mel_g[..., :n_early])
                mel_g = mel_g[..., n_early:]
            mel_g, log_det_W, log_s = _flow_step_forward(
                params, flow_p, mel_g.shape[-1], mel_g, ctx, mask_g)
            log_s_list.append(log_s)
            log_det_W_list.append(log_det_W)
        z_out.append(mel_g)
        outputs["z_mel"] = jnp.concatenate(z_out, axis=-1)
        outputs["log_s_list"] = log_s_list
        outputs["log_det_W_list"] = log_det_W_list

    if "dpm" in include:
        if attn_hard is None:
            attn_hard = binarize_attention(attn_soft, in_lens, out_lens)
        durations = jnp.sum(attn_hard, axis=1)  # (B, N)
        sg = jax.lax.stop_gradient
        outputs["duration_model_outputs"] = attribute_model_forward(
            params["dur_pred_layer"], sg(text_enc), sg(speaker_vecs),
            sg(durations.astype(jnp.float32)), in_lens, training=training,
            dropout_rng=rngs.get("dur"))

    if "apm" in include:
        sg = jax.lax.stop_gradient
        if attn_hard is None:
            attn_hard = binarize_attention(attn_soft, in_lens, out_lens)
        if binarize_attention_flag:
            text_enc_time_expanded = context
        else:
            text_enc_time_expanded = jnp.einsum(
                "btn,bnc->btc", attn_hard, text_enc)

        if meta["use_vpred_module"]:
            outputs["vpred_model_outputs"] = attribute_model_forward(
                params["v_pred_module"], sg(text_enc_time_expanded),
                sg(speaker_vecs), sg(voiced_mask), out_lens,
                training=training, dropout_rng=rngs.get("vpred"))
            if meta["ap_use_voiced_embeddings"]:
                text_enc_time_expanded = apply_voice_mask_to_text(
                    params, text_enc_time_expanded, voiced_mask)

        f0_target = f0
        if meta["ap_use_unvoiced_bias"]:
            f0_target = sg(f0_target * voiced_mask + f0_bias)
        else:
            f0_target = sg(f0_target)
        vm_bool = voiced_mask.astype(bool)
        f0_target = jnp.where(
            vm_bool, jnp.log(jnp.maximum(f0_target, 1e-10)), f0_target)
        f0_target = f0_target / 6.0
        energy_target = energy_avg * 2.0 - 1.0

        if meta["use_first_order_features"]:
            df0 = get_first_order_features(f0_target)
            denergy = get_first_order_features(energy_target)
            f0_in = jnp.stack([f0_target, df0], axis=-1) * 3.0  # (B,T,2)
            energy_in = jnp.stack([energy_target, denergy], axis=-1) * 3.0
        else:
            f0_in = f0_target * 2.0
            energy_in = energy_target * 1.4

        # Fuse the two DAP BiLSTM recurrences into one scan when shapes
        # match (the flagship config) — same batching as the inference
        # path; per-model conv fronts keep their own dropout streams.
        from radtts_tpu.models.attributes import (dap_bilstm_shape,
                                                  dap_forward_fused)
        f0_lstm = dap_bilstm_shape(params["f0_pred_module"])
        e_lstm = dap_bilstm_shape(params["energy_pred_module"])
        if f0_lstm is not None and f0_lstm == e_lstm:
            f0_out, e_out = dap_forward_fused(
                [params["f0_pred_module"], params["energy_pred_module"]],
                [text_enc_time_expanded, text_enc_time_expanded],
                [sg(speaker_vecs), sg(speaker_vecs)],
                [f0_in, energy_in], out_lens, training=training,
                rng_list=[rngs.get("f0"), rngs.get("energy")])
            outputs["f0_model_outputs"] = f0_out
            outputs["energy_model_outputs"] = e_out
        else:
            outputs["f0_model_outputs"] = attribute_model_forward(
                params["f0_pred_module"], text_enc_time_expanded,
                sg(speaker_vecs), f0_in, out_lens, training=training,
                dropout_rng=rngs.get("f0"))
            outputs["energy_model_outputs"] = attribute_model_forward(
                params["energy_pred_module"], text_enc_time_expanded,
                sg(speaker_vecs), energy_in, out_lens, training=training,
                dropout_rng=rngs.get("energy"))

    return outputs


# ---------------------------------------------------------------------------
# inference (reference: radtts.py:541-730), two static-shape stages
# ---------------------------------------------------------------------------


def infer_durations(params, rng, speaker_id_text, text, sigma_dur=0.8,
                    token_dur_scaling=1.0, token_duration_max=100,
                    in_lens=None, z_dur=None):
    """Stage 1: predict integer per-token durations. text: (B, N).

    in_lens: optional (B,) true token counts for batched inference over
    padded texts (masked encoder path == the exact-length single-item
    path; pad positions get duration 0).
    z_dur: optional (B, N, 1) injected noise (parity/testing; reference
    samples inline, radtts.py:557-559)."""
    spk_vec_text = encode_speaker(params, speaker_id_text)
    txt_enc, _ = encode_text(params, text, in_lens)
    B, N = text.shape
    if z_dur is None:
        z_dur = jax.random.normal(rng, (B, N, 1)) * sigma_dur
    dur = attribute_model_infer(params["dur_pred_layer"], z_dur, txt_enc,
                                spk_vec_text, in_lens)
    dur = dur[..., 0]
    g_dur = params["dur_pred_layer"]["_meta"].get("n_group_size", 1)
    if dur.shape[1] < N:
        # grouped (BGAP/AGAP n_group_size>1) duration models emit N/g
        # tokens; replication-pad back to text length (reference:
        # radtts.py:562-566, nn.ReplicationPad1d)
        pad = N - dur.shape[1]
        dur = jnp.concatenate(
            [dur, jnp.repeat(dur[:, -1:], pad, axis=1)], axis=1)
    if in_lens is not None and g_dur > 1:
        # batched padded texts: the last computed group per item is
        # (len//g)-1 — tokens past (len//g)*g must replicate that group's
        # last value (what the reference's ReplicationPad1d does at exact
        # length), not take values computed from pad-contaminated groups
        last = jnp.maximum((in_lens // g_dur) * g_dur - 1, 0)
        idx = jnp.minimum(jnp.arange(N)[None, :], last[:, None])
        dur = jnp.take_along_axis(dur, idx, axis=1)
    dur = jnp.clip(dur, 0, token_duration_max)
    if token_dur_scaling > 0:
        dur = dur * token_dur_scaling
    dur = jnp.floor(dur + 0.5).astype(jnp.int32)
    if in_lens is not None:
        dur = dur * (jnp.arange(N)[None, :] < in_lens[:, None])
    return dur


def renormalize_f0(f0, voiced_mask, f0_mean, f0_std=0.0, out_lens=None):
    """Shift/scale voiced f0 frames to a target mean/std, PER ITEM.

    Stats are per-row masked mean/std with Bessel correction over that
    item's voiced frames, so a padded batch of N equals N single calls.
    At B=1 this matches the reference's batch-flattened boolean-mask
    indexing f0[vmask_bool].mean()/.std() (reference: radtts.py:613-622)
    exactly; at B>1 the reference would pool stats across items, which is
    a batching artifact we deliberately do not reproduce.

    out_lens: optional (B,) valid frame counts — padding frames past an
    item's length are excluded from its stats (the voiced-mask predictor
    runs on padded frames too and can mark them voiced)."""
    vm = voiced_mask
    if out_lens is not None:
        T = f0.shape[-1]
        vm = vm * (jnp.arange(T)[None, :] < out_lens[:, None])
    cnt = jnp.sum(vm, axis=-1, keepdims=True)
    mu = jnp.sum(f0 * vm, axis=-1, keepdims=True) / jnp.maximum(cnt, 1)
    var = (jnp.sum(jnp.square(f0 - mu) * vm, axis=-1, keepdims=True)
           / jnp.maximum(cnt - 1, 1))
    sig = jnp.sqrt(var)
    f0_std_eff = f0_std if f0_std > 0 else sig
    return jnp.where(vm.astype(bool),
                     (f0 - mu) / sig * f0_std_eff + f0_mean, f0)


def radtts_infer(params, rng, speaker_id, text, sigma, max_frames, *,
                 sigma_f0=0.8, sigma_energy=0.8, dur=None,
                 speaker_id_text=None, speaker_id_attributes=None, f0=None,
                 energy_avg=None, voiced_mask=None, f0_mean=0.0, f0_std=0.0,
                 energy_mean=0.0, energy_std=0.0, residual=None, z_f0=None,
                 z_energy=None, in_lens=None):
    """Stage 2: attributes + inverse flow decode at a static frame budget.

    dur: (B, N) int durations (from infer_durations or ground truth).
    max_frames: static int >= sum(dur), multiple of every group size in play.
    in_lens: optional (B,) true token counts (batched padded texts).
    Returns dict with mel (B, max_frames, n_mel); frames past sum(dur) are
    garbage to be sliced off by the caller.
    """
    meta = params["_meta"]
    g = meta["n_group_size"]
    B = text.shape[0]
    rng, r_f0, r_energy, r_res = jax.random.split(rng, 4)

    spk_vec = encode_speaker(params, speaker_id)
    spk_vec_attrs = (spk_vec if speaker_id_attributes is None
                     else encode_speaker(params, speaker_id_attributes))
    txt_enc, _ = encode_text(params, text, in_lens)

    out_lens = jnp.sum(dur, axis=1)
    txt_enc_time_expanded = regulate_length(txt_enc, dur, max_frames)

    if not is_attribute_unconditional(meta):
        if voiced_mask is None and meta["use_vpred_module"]:
            v_logits = attribute_model_infer(
                params["v_pred_module"], None, txt_enc_time_expanded,
                spk_vec_attrs, out_lens)
            voiced_mask = (jax.nn.sigmoid(v_logits[..., 0]) > 0.5)
            voiced_mask = voiced_mask.astype(jnp.float32)

        ap_txt_enc = txt_enc_time_expanded
        if meta["ap_use_voiced_embeddings"]:
            ap_txt_enc = apply_voice_mask_to_text(
                params, txt_enc_time_expanded, voiced_mask)

        f0_bias = 0.0
        if meta["use_unvoiced_bias"]:
            f0_bias = _unvoiced_bias(params, meta, txt_enc_time_expanded,
                                     voiced_mask)

        # When both f0 and energy come from fusable ConvLSTMLinear-BiLSTM
        # DAPs (the flagship config), run their recurrences as ONE scan —
        # DAP ignores the sampling residual, so the fused path is exactly
        # the two dap_infer calls batched (reference runs them back to
        # back: radtts.py:605-625).
        from radtts_tpu.models.attributes import (dap_bilstm_shape,
                                                  dap_infer_fused)
        f0_lstm = dap_bilstm_shape(params["f0_pred_module"]) \
            if f0 is None and "f0_pred_module" in params else None
        e_lstm = dap_bilstm_shape(params["energy_pred_module"]) \
            if energy_avg is None and "energy_pred_module" in params else None
        if (f0 is None and energy_avg is None and f0_lstm is not None
                and f0_lstm == e_lstm):
            f0_raw, e_raw = dap_infer_fused(
                [params["f0_pred_module"], params["energy_pred_module"]],
                [ap_txt_enc, ap_txt_enc], [spk_vec_attrs, spk_vec],
                out_lens)
            f0 = _f0_postprocess(meta, f0_raw, voiced_mask)[..., 0]
            energy_avg = _energy_postprocess(meta, e_raw)[..., 0]

        if f0 is None:
            n_f0_ch = 2 if meta["use_first_order_features"] else 1
            if z_f0 is None:
                z_f0 = jax.random.normal(
                    r_f0, (B, max_frames, n_f0_ch)) * sigma_f0
            f0 = infer_f0(params, z_f0, ap_txt_enc, spk_vec_attrs,
                          voiced_mask, out_lens)[..., 0]

        if f0_mean > 0.0:
            f0 = renormalize_f0(f0, voiced_mask, f0_mean, f0_std,
                                out_lens=out_lens)

        if energy_avg is None:
            n_e_ch = 2 if meta["use_first_order_features"] else 1
            if z_energy is None:
                z_energy = jax.random.normal(
                    r_energy, (B, max_frames, n_e_ch)) * sigma_energy
            energy_avg = infer_energy(params, z_energy, ap_txt_enc, spk_vec,
                                      out_lens)[..., 0]

        if meta["decoder_use_unvoiced_bias"]:
            f0_ctx = f0 * voiced_mask + f0_bias
        else:
            f0_ctx = f0 * voiced_mask
        ctx = preprocess_context(params, txt_enc_time_expanded, spk_vec,
                                 out_lens, f0_ctx, energy_avg)
    else:
        ctx = preprocess_context(params, txt_enc_time_expanded, spk_vec,
                                 out_lens, None, None)

    n_mel = meta["n_mel_channels"]
    Tg = max_frames // g
    if residual is None:
        residual = jax.random.normal(r_res, (B, Tg, n_mel * g)) * sigma

    exit_stack = list(meta["exit_steps"])
    n_early = meta["n_early_size"]
    mel_g = residual[..., len(exit_stack) * n_early:]
    remaining = residual[..., : len(exit_stack) * n_early]
    lens_g = out_lens // g
    mask_g = sequence_mask(lens_g, Tg)

    for i in reversed(range(meta["n_flows"])):
        flow_p = params["flows"][i]
        mel_g = _flow_step_inverse(params, flow_p, mel_g, ctx, mask_g)
        if exit_stack and i == exit_stack[-1]:
            exit_stack.pop()
            chunk = remaining[..., len(exit_stack) * n_early:]
            remaining = remaining[..., : len(exit_stack) * n_early]
            mel_g = jnp.concatenate([chunk, mel_g], axis=-1)

    mel = fold_group(mel_g, g)
    if meta["do_mel_descaling"]:
        mel = mel * 2 - 5.5

    return {"mel": mel, "dur": dur, "f0": f0, "energy_avg": energy_avg,
            "voiced_mask": voiced_mask, "out_lens": out_lens}


def infer_f0(params, residual, txt_enc_time_expanded, spk_vec,
             voiced_mask=None, lens=None):
    """(reference: radtts.py:686-718) attribute flow/regressor sampling plus
    the magic rescaling constants."""
    f0 = attribute_model_infer(params["f0_pred_module"], residual,
                               txt_enc_time_expanded, spk_vec, lens)
    return _f0_postprocess(params["_meta"], f0, voiced_mask)


def _f0_postprocess(meta, f0, voiced_mask=None):
    if meta["ap_pred_log_f0"]:
        if meta["use_first_order_features"]:
            f0 = f0[..., 0:1] / 3.0
        else:
            f0 = f0 / 2.0
        f0 = f0 * 6.0
    else:
        f0 = f0 / 6.0
        f0 = f0 / 640.0

    if voiced_mask is None:
        vm = f0 > 0.0
    else:
        vm = voiced_mask.astype(bool)
        if vm.ndim == 2:
            vm = vm[:, :, None]
        vm = vm[:, : f0.shape[1]]
    if meta["ap_pred_log_f0"]:
        f0 = jnp.where(vm, jnp.exp(f0), f0)
    f0 = jnp.where(vm, f0, 0.0)
    return f0


def infer_energy(params, residual, txt_enc_time_expanded, spk_vec, lens):
    """(reference: radtts.py:720-730)."""
    energy = attribute_model_infer(params["energy_pred_module"], residual,
                                   txt_enc_time_expanded, spk_vec, lens)
    return _energy_postprocess(params["_meta"], energy)


def _energy_postprocess(meta, energy):
    if meta["use_first_order_features"]:
        energy = energy[..., 0:1] / 3.0
    else:
        energy = energy / 1.4
    return (energy + 1.0) / 2.0
