"""Reference workflow parity for include_modules subsets: the standalone
alignment module ("atn" — reference README 'A standalone alignment module
for learning unsupervised text-audio alignments') and the attribute-free
decoder ("decatn", the config_ljs_radtts.json mode). Both must forward,
produce finite losses, and yield finite grads (reference: radtts.py:111,
186, 219 gate submodules by substring; loss.py:147-203 skips absent
outputs)."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.small_model import MODEL_CONFIG

_LOSS_W = {"blank_logprob": -1, "ctc_loss_weight": 0.1,
           "binarization_loss_weight": 1.0}


def _batch(B=2, N=12, T=32, n_mel=20):
    r = np.random.default_rng(0)
    return dict(
        mel=jnp.asarray(r.standard_normal((B, T, n_mel)).astype(np.float32)),
        spk=jnp.zeros((B,), jnp.int32),
        text=jnp.asarray(r.integers(1, 180, (B, N))),
        in_lens=jnp.asarray([N, N - 2]),
        out_lens=jnp.asarray([T, T - 4]),
        prior=jnp.asarray((r.random((B, T, N)) * 0.5 + 0.25)
                          .astype(np.float32)))


def _total_loss(cfg, dur_cfg=None):
    from radtts_tpu.losses import radtts_loss
    from radtts_tpu.models.radtts import radtts_forward, radtts_init

    params = radtts_init(jax.random.PRNGKey(0), cfg)
    b = _batch(n_mel=cfg["n_mel_channels"])

    def loss_fn(p):
        out = radtts_forward(
            p, b["mel"], b["spk"], b["text"], b["in_lens"], b["out_lens"],
            binarize_attention_flag=True, attn_prior=b["prior"])
        ld = radtts_loss(out, b["in_lens"], b["out_lens"], sigma=1.0,
                         n_group_size=cfg["n_group_size"],
                         dur_model_config=dur_cfg, loss_weights=_LOSS_W)
        total = 0.0
        for v, w in ld.values():
            if w > 0:
                total = total + v * w
        return total, ld

    (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return total, ld, grads


def _strip_attrs(cfg):
    return dict(cfg, decoder_use_unvoiced_bias=False,
                ap_use_unvoiced_bias=False,
                ap_use_voiced_embeddings=False,
                context_lstm_w_f0_and_energy=False,
                n_f0_dims=0, n_energy_avg_dims=0)


def test_atn_only_trains():
    cfg = _strip_attrs(dict(MODEL_CONFIG, include_modules="atn"))
    total, ld, grads = _total_loss(cfg)
    assert "loss_mel" not in ld          # no decoder
    assert "loss_ctc" in ld
    assert np.isfinite(float(total))
    leaves = [g for g in jax.tree.leaves(grads)
              if hasattr(g, "dtype") and jnp.issubdtype(g.dtype,
                                                       jnp.floating)]
    assert leaves and all(bool(jnp.isfinite(g).all()) for g in leaves)


def test_decatn_trains():
    """config_ljs_radtts.json's mode: decoder + alignment, no attribute
    predictors, no f0/energy conditioning."""
    cfg = _strip_attrs(dict(MODEL_CONFIG, include_modules="decatn"))
    total, ld, grads = _total_loss(cfg)
    assert "loss_mel" in ld and "loss_ctc" in ld
    assert np.isfinite(float(total))
    leaves = [g for g in jax.tree.leaves(grads)
              if hasattr(g, "dtype") and jnp.issubdtype(g.dtype,
                                                       jnp.floating)]
    assert leaves and all(bool(jnp.isfinite(g).all()) for g in leaves)
