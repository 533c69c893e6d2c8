"""Training losses (behavior parity with reference loss.py:27-203).

The attention CTC loss is fully batched (one vectorized optax CTC over the
padded batch) instead of the reference's per-item Python loop over
nn.CTCLoss (loss.py:118-135).

Layouts: z/log_s are channels-last (B, T, C); masks are (B, T).
"""

import jax
import jax.numpy as jnp
import optax

from radtts_tpu.ops.masking import sequence_mask


def compute_flow_loss(z, log_det_W_list, log_s_list, n_elements, n_dims,
                      mask, sigma=1.0):
    """mask: (B, T, 1) float. Returns (loss, loss_prior)."""
    log_s_total = 0.0
    log_det_W_total = 0.0
    for log_s in log_s_list:
        log_s_total = log_s_total + jnp.sum(log_s * mask)
    if log_det_W_list:
        for log_det_W in log_det_W_list:
            log_det_W_total = log_det_W_total + log_det_W
        log_det_W_total = log_det_W_total * n_elements

    z = z * mask
    prior_nll = jnp.sum(z * z) / (2 * sigma * sigma)

    loss = prior_nll - log_s_total - log_det_W_total
    denom = n_elements * n_dims
    return loss / denom, prior_nll / denom


def compute_regression_loss(x_hat, x, mask, name=False):
    """x_hat: (B, T, C); x: (B, T) or (B, T, C); mask: (B, T, 1) float."""
    if x.ndim == 2:
        x = x[:, :, None]
    x = x * mask
    x_hat = x_hat * mask
    if name == "vpred":
        # BCE with logits, sum reduction; optax sigmoid_binary_cross_entropy
        # is elementwise -[y log p + (1-y) log(1-p)] on logits
        loss = jnp.sum(optax.sigmoid_binary_cross_entropy(x_hat, x))
    else:
        loss = jnp.sum(jnp.square(x_hat - x))
    loss = loss / jnp.sum(mask)
    return {f"loss_{name}": loss}


def attribute_prediction_loss(name, model_output, lens, loss_weight,
                              n_group_size=1, sigma=1.0):
    """(reference: loss.py:74-108)."""
    lens_g = lens // n_group_size
    max_t = (model_output.get("z") if "z" in model_output
             else model_output["x_hat"]).shape[1]
    mask = sequence_mask(lens_g, max_t).astype(jnp.float32)[:, :, None]
    loss_dict = {}
    if "z" in model_output and model_output["z"] is not None:
        n_elements = jnp.sum(lens) // n_group_size
        n_dims = model_output["z"].shape[-1]
        loss, loss_prior = compute_flow_loss(
            model_output["z"], model_output["log_det_W_list"],
            model_output["log_s_list"], n_elements, n_dims, mask, sigma)
        loss_dict = {f"loss_{name}": (loss, loss_weight),
                     f"loss_prior_{name}": (loss_prior, 0.0)}
    elif "x_hat" in model_output:
        reg = compute_regression_loss(model_output["x_hat"],
                                      model_output["x"], mask, name)
        loss_dict = {k: (v, loss_weight) for k, v in reg.items()}
    if not loss_dict:
        raise ValueError("loss not supported")
    return loss_dict


def attention_ctc_loss(attn_logprob, in_lens, out_lens, blank_logprob=-1.0):
    """Batched version of the reference's per-item CTC forcing monotone
    coverage of all text tokens (loss.py:111-135).

    attn_logprob: (B, T_mel, T_text). Classes = [blank] + text positions;
    targets for item b are (1..in_lens[b]). Per-item losses are divided by
    target length then averaged (torch nn.CTCLoss reduction='mean').
    """
    B, T_mel, T_text = attn_logprob.shape
    logits = jnp.concatenate(
        [jnp.full((B, T_mel, 1), blank_logprob, attn_logprob.dtype),
         attn_logprob], axis=-1)

    # restrict the per-item class set to in_lens[b]+1 entries before the
    # (internal) log_softmax, like the reference's sliced log_softmax
    classes = jnp.arange(T_text + 1)
    class_valid = classes[None, :] <= in_lens[:, None]  # (B, K)
    logits = jnp.where(class_valid[:, None, :], logits, -1e9)

    labels = jnp.broadcast_to(jnp.arange(1, T_text + 1)[None, :],
                              (B, T_text))
    label_paddings = (~sequence_mask(in_lens, T_text)).astype(jnp.float32)
    logit_paddings = (~sequence_mask(out_lens, T_mel)).astype(jnp.float32)

    per_item = optax.ctc_loss(logits, logit_paddings, labels,
                              label_paddings, blank_id=0)
    per_item = per_item / in_lens.astype(per_item.dtype)
    per_item = jnp.where(jnp.isfinite(per_item), per_item, 0.0)  # zero_inf
    return jnp.mean(per_item)


def attention_binarization_loss(hard_attention, soft_attention):
    """(reference: loss.py:138-144)."""
    log_sum = jnp.sum(jnp.log(jnp.clip(soft_attention, 1e-12))
                      * hard_attention)
    return -log_sum / jnp.sum(hard_attention)


def radtts_loss(model_output, in_lens, out_lens, *, sigma=1.0,
                n_group_size=1, dur_model_config=None, f0_model_config=None,
                energy_model_config=None, vpred_model_config=None,
                loss_weights=None):
    """Aggregate training loss -> {name: (value, weight)}
    (reference: loss.py:147-203)."""
    loss_weights = loss_weights or {}
    loss_dict = {}
    z_mel = model_output.get("z_mel")
    if z_mel is not None:
        n_elements = jnp.sum(out_lens) // n_group_size
        lens_g = out_lens // n_group_size
        mask = sequence_mask(lens_g, z_mel.shape[1])
        mask = mask.astype(jnp.float32)[:, :, None]
        n_dims = z_mel.shape[-1]
        loss_mel, loss_prior_mel = compute_flow_loss(
            z_mel, model_output["log_det_W_list"],
            model_output["log_s_list"], n_elements, n_dims, mask, sigma)
        loss_dict["loss_mel"] = (loss_mel, 1.0)
        loss_dict["loss_prior_mel"] = (loss_prior_mel, 0.0)

    ctc_cost = attention_ctc_loss(
        model_output["attn_logprob"], in_lens, out_lens,
        blank_logprob=loss_weights.get("blank_logprob", -1))
    loss_dict["loss_ctc"] = (ctc_cost, loss_weights.get("ctc_loss_weight",
                                                        0.1))

    attr_cfgs = {
        "duration_model_outputs": ("duration", dur_model_config,
                                   loss_weights.get("dur_loss_weight", 1.0),
                                   "in"),
        "f0_model_outputs": ("f0", f0_model_config,
                             loss_weights.get("f0_loss_weight", 1.0), "out"),
        "energy_model_outputs": ("energy", energy_model_config,
                                 loss_weights.get("energy_loss_weight", 1.0),
                                 "out"),
        "vpred_model_outputs": ("vpred", vpred_model_config,
                                loss_weights.get("vpred_loss_weight", 1.0),
                                "out"),
    }
    for key, (name, cfg, weight, lens_kind) in attr_cfgs.items():
        if cfg is None:
            continue
        mout = model_output.get(key)
        if mout is None or len(mout) == 0:
            continue
        t_lens = in_lens if lens_kind == "in" else out_lens
        g = cfg.get("hparams", {}).get("n_group_size", 1)
        loss_dict.update(attribute_prediction_loss(
            name, mout, t_lens, weight, n_group_size=g, sigma=1.0))
    return loss_dict
