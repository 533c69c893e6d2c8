#!/usr/bin/env python
"""Decode-stage internals on the live chip: where do the ~3.7 ms go?

Times the decode stage's sub-blocks separately with the same scan+difference
method as profile_stages.py (all reps inside one jitted scan; 1-rep run of
the same executable subtracted):

  - text encoder (+ length regulation)
  - vpred DAP inference
  - fused f0+energy DAP inference (ConvLSTMLinear: the 608-step BiLSTM scan)
  - preprocess_context (the 608-step context BiLSTM)
  - the 8-step inverse flow chain alone (WN 1024-wide convs at Tg frames)

Sub-block times won't sum exactly to the full decode stage (XLA fuses
across the seams) but they rank the optimization targets.
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import _flagship_model_config
from radtts_tpu.models.radtts import (apply_voice_mask_to_text,
                                      encode_speaker, encode_text,
                                      preprocess_context, radtts_init,
                                      radtts_infer, _flow_step_inverse)
from radtts_tpu.ops.invertible import precompute_inverses
from radtts_tpu.ops.length_regulator import regulate_length
from radtts_tpu.ops.masking import sequence_mask

N_REPS = 10
PAIRS = 5
MAX_FRAMES = 608
# PROF_N_TOKENS=160 matches the bench sentence length; the token-level
# scans (text-encoder BiLSTM, token DAPs) scale with it while the
# frame-level blocks don't — comparing 64 vs 160 attributes the
# token-count-dependent share of the decode stage
N_TOKENS = int(os.environ.get("PROF_N_TOKENS", "64"))
AUDIO_S = MAX_FRAMES * 256 / 22050

from profile_stages import staged  # noqa: E402  (same methodology)


def main():
    small = "--small" in sys.argv  # CPU smoke mode: tiny dims, fast compile
    if small:
        jax.config.update("jax_platforms", "cpu")
    mc = _flagship_model_config(small=small)
    params = precompute_inverses(radtts_init(jax.random.PRNGKey(0), mc))
    meta = params["_meta"]
    g = meta["n_group_size"]
    n_mel = meta["n_mel_channels"]

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 180, (1, N_TOKENS)).astype(np.int32))
    spk = jnp.zeros((1,), jnp.int32)
    dur = jnp.full((1, N_TOKENS), MAX_FRAMES // N_TOKENS, jnp.int32)
    out_lens = jnp.sum(dur, axis=1)
    k = jax.random.PRNGKey(3)

    # fixed representative intermediates (stage timing is data-independent)
    spk_vec = encode_speaker(params, spk)
    txt_time = jnp.asarray(rng.standard_normal(
        (1, MAX_FRAMES, meta["n_text_dim"])).astype(np.float32))
    f0 = jnp.asarray((rng.random((1, MAX_FRAMES)) * 200 + 100)
                     .astype(np.float32))
    energy = jnp.asarray(rng.random((1, MAX_FRAMES)).astype(np.float32))
    voiced = jnp.ones((1, MAX_FRAMES), jnp.float32)

    total = 0.0

    total += staged(
        "encode_text+regulate",
        lambda x, i, p: regulate_length(
            encode_text(p, text, None)[0] + 1e-30 * jnp.mean(x) + 1e-30 * i,
            dur, MAX_FRAMES),
        jnp.zeros((4,)), params)

    if meta["use_vpred_module"]:
        from radtts_tpu.models.attributes import attribute_model_infer
        total += staged(
            "vpred DAP",
            lambda x, i, p: attribute_model_infer(
                p["v_pred_module"], None,
                txt_time + 1e-30 * jnp.mean(x) + 1e-30 * i, spk_vec,
                out_lens),
            jnp.zeros((4,)), params)

    from radtts_tpu.models.attributes import (dap_bilstm_shape,
                                              dap_infer_fused)
    if ("f0_pred_module" in params and "energy_pred_module" in params
            and dap_bilstm_shape(params["f0_pred_module"])
            == dap_bilstm_shape(params["energy_pred_module"])):
        ap_txt = apply_voice_mask_to_text(params, txt_time, voiced) \
            if meta["ap_use_voiced_embeddings"] else txt_time

        def f_dap(x, i, p):
            a, b = dap_infer_fused(
                [p["f0_pred_module"], p["energy_pred_module"]],
                [ap_txt + 1e-30 * jnp.mean(x) + 1e-30 * i, ap_txt],
                [spk_vec, spk_vec], out_lens)
            return a + jnp.mean(b)
        total += staged("f0+energy fused DAP", f_dap,
                        jnp.zeros((4,)), params)

    total += staged(
        "preprocess_context(LSTM)",
        lambda x, i, p: preprocess_context(
            p, txt_time + 1e-30 * jnp.mean(x) + 1e-30 * i, spk_vec,
            out_lens, f0 * voiced, energy),
        jnp.zeros((4,)), params)

    # inverse flow chain alone; build the real context once (shape source
    # of truth) instead of deriving its width from config arithmetic
    Tg = MAX_FRAMES // g
    ctx_real = preprocess_context(params, txt_time, spk_vec, out_lens,
                                  f0 * voiced, energy)
    mel_g0 = jnp.asarray(rng.standard_normal(
        (1, Tg, n_mel * g - len(meta["exit_steps"])
         * meta["n_early_size"])).astype(np.float32))
    mask_g = sequence_mask(out_lens // g, Tg)

    def f_flows(x, i, p, ctx):
        exit_stack = list(p["_meta"]["exit_steps"])
        n_early = p["_meta"]["n_early_size"]
        mel_g = mel_g0 + 1e-30 * jnp.mean(x) + 1e-30 * i
        rem_width = len(exit_stack) * n_early
        remaining = jnp.zeros((1, Tg, rem_width), mel_g.dtype)
        for fi in reversed(range(p["_meta"]["n_flows"])):
            mel_g = _flow_step_inverse(p, p["flows"][fi], mel_g, ctx,
                                       mask_g)
            if exit_stack and fi == exit_stack[-1]:
                exit_stack.pop()
                chunk = remaining[..., len(exit_stack) * n_early:]
                remaining = remaining[..., : len(exit_stack) * n_early]
                mel_g = jnp.concatenate([chunk, mel_g], axis=-1)
        return mel_g
    total += staged("inverse flows (x%d)" % meta["n_flows"], f_flows,
                    jnp.zeros((4,)), params, ctx_real)

    def f_full(x, i, p):
        return radtts_infer(p, jax.random.fold_in(k, i), spk, text, 0.8,
                            MAX_FRAMES, dur=dur, sigma_f0=1.0,
                            sigma_energy=1.0)["mel"] + 1e-30 * jnp.mean(x)
    full = staged("FULL decode stage", f_full, jnp.zeros((4,)), params)

    print(f"{'sub-block sum':30s} {total*1000:8.2f} ms "
          f"(full stage {full*1000:.2f} ms; deltas = fusion across seams)")


if __name__ == "__main__":
    main()
