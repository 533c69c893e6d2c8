"""Vocoder fine-tuning loop: a few adversarial steps on synthetic audio
must run finite and reduce the mel reconstruction term, and the torch
export must round-trip through both our loader and the reference
Generator (strict=True)."""

import json
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_utils import install_reference

install_reference()

from hifigan_models import Generator as RefGenerator  # noqa: E402

from radtts_tpu.models.hifigan import (AttrDict,  # noqa: E402
                                       hifigan_generator_apply,
                                       hifigan_generator_from_torch,
                                       hifigan_generator_to_torch)
from radtts_tpu.train.vocoder_trainer import (  # noqa: E402
    SegmentSampler, make_optimizers, make_vocoder_train_step,
    vocoder_train_init)

H_SMALL = {
    "resblock": "1",
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "gaussian_blur": {"p_blurring": 0.0},
    "num_mels": 80,
}

MEL_KW = dict(filter_length=1024, hop_length=256, win_length=1024,
              n_mel_channels=80, sampling_rate=22050, mel_fmin=0.0,
              mel_fmax=8000.0)


@pytest.mark.slow
def test_vocoder_train_steps_reduce_mel_loss():
    params = vocoder_train_init(jax.random.PRNGKey(0), H_SMALL)
    optim_g, optim_d = make_optimizers(lr=2e-3)
    opt_g = optim_g.init(params["gen"])
    opt_d = optim_d.init({"mpd": params["mpd"], "msd": params["msd"]})
    step = make_vocoder_train_step(MEL_KW, optim_g, optim_d)

    rng = np.random.default_rng(0)
    t = np.arange(4096) / 22050
    audio = np.stack([
        0.3 * np.sin(2 * np.pi * 220 * t),
        0.3 * np.sin(2 * np.pi * 330 * t)]).astype(np.float32)
    audio = jnp.asarray(audio)

    key = jax.random.PRNGKey(1)
    first = None
    for it in range(8):
        key, sub = jax.random.split(key)
        params, opt_g, opt_d, metrics = step(params, opt_g, opt_d, audio,
                                             sub)
        m = {k: float(v) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in m.values()), m
        if first is None:
            first = m["loss_mel"]
    assert m["loss_mel"] < first, (first, m["loss_mel"])


def test_generator_torch_export_roundtrip():
    params = vocoder_train_init(jax.random.PRNGKey(2), H_SMALL)["gen"]
    sd = hifigan_generator_to_torch(params)

    # loads into the reference Generator strictly
    ref = RefGenerator(AttrDict(dict(H_SMALL)))
    ref.load_state_dict(sd)  # reference overrides load_state_dict (legacy remap)

    # and back through our loader with identical audio
    params2 = hifigan_generator_from_torch(sd, H_SMALL)
    mel = jnp.asarray(np.random.default_rng(3)
                      .standard_normal((1, 24, 80)).astype(np.float32))
    y1 = np.asarray(hifigan_generator_apply(params, mel))
    y2 = np.asarray(hifigan_generator_apply(params2, mel))
    np.testing.assert_allclose(y2, y1, rtol=1e-5, atol=1e-6)

    # and matches the torch reference forward
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(
            np.asarray(mel).transpose(0, 2, 1)))[:, 0].numpy()
    np.testing.assert_allclose(y1, y_ref, rtol=1e-4, atol=1e-5)


def test_segment_sampler_shapes(tmp_path):
    from scipy.io import wavfile
    sr = 22050
    p = tmp_path / "a.wav"
    wavfile.write(p, sr, (np.sin(np.arange(3000) / 20) * 20000)
                  .astype(np.int16))
    s = SegmentSampler([str(p)], segment_size=4096, seed=0)
    out = s.sample(3)
    assert out.shape == (3, 4096)
    assert np.abs(out).max() <= 1.0


def test_gen_grads_trace_with_pallas_mrf_requested():
    """mrf_impl='pallas' (what 'auto' resolves to on TPU): the generator
    gradient pass must still trace — pallas_call has no transpose rule in
    jax, so reverse-mode AD through the fused MRF would raise at trace
    time. The step routes gen grads through the XLA MRF while keeping the
    kernel for the forward-only discriminator pass."""
    params = vocoder_train_init(jax.random.PRNGKey(0), H_SMALL)
    optim_g, optim_d = make_optimizers()
    opt_g = optim_g.init(params["gen"])
    opt_d = optim_d.init({"mpd": params["mpd"], "msd": params["msd"]})
    step = make_vocoder_train_step(MEL_KW, optim_g, optim_d,
                                   mrf_impl="pallas")
    audio = jax.ShapeDtypeStruct((2, 4096), jnp.float32)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    # abstract trace only — no lowering, so it runs without a TPU backend;
    # raises NotImplementedError if pallas ends up in the diff path
    jax.eval_shape(step, params, opt_g, opt_d, audio, rng)


@pytest.mark.slow
def test_vocoder_resume_bit_exact(tmp_path):
    """train_vocoder.py --resume contract: 4 straight steps must equal
    2 steps + full-state save/load + 2 steps, bit for bit — rng and
    segment draws are keyed by the ITERATION (not a restarting stream),
    and the do_* checkpoint restores discriminators + both optimizers."""
    from scipy.io import wavfile

    from radtts_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    p = tmp_path / "a.wav"
    t = np.arange(12000) / 22050
    wavfile.write(p, 22050,
                  (np.sin(2 * np.pi * 220 * t) * 18000).astype(np.int16))
    sampler = SegmentSampler([str(p)], segment_size=4096, seed=3)
    base = jax.random.PRNGKey(7)

    def fresh():
        params = vocoder_train_init(jax.random.PRNGKey(0), H_SMALL)
        optim_g, optim_d = make_optimizers(lr=2e-3)
        opt_g = optim_g.init(params["gen"])
        opt_d = optim_d.init({"mpd": params["mpd"], "msd": params["msd"]})
        step = make_vocoder_train_step(MEL_KW, optim_g, optim_d)
        return params, opt_g, opt_d, step

    def advance(state, its):
        params, opt_g, opt_d, step = state
        for it in its:
            audio = jnp.asarray(sampler.sample(2, step=it))
            sub = jax.random.fold_in(base, it)
            params, opt_g, opt_d, _ = step(params, opt_g, opt_d, audio, sub)
        return params, opt_g, opt_d, step

    # uninterrupted
    pa, _, _, _ = advance(fresh(), range(4))

    # interrupted at iteration 2 + full-state resume
    params, opt_g, opt_d, step = advance(fresh(), range(2))
    ck = str(tmp_path / "do_00000002")
    save_checkpoint(ck, params, {"g": opt_g, "d": opt_d}, iteration=2)
    params2, opt_g2, opt_d2, step2 = fresh()
    params2, opts, meta = load_checkpoint(ck, params2,
                                          {"g": opt_g2, "d": opt_d2})
    assert int(meta["iteration"]) == 2
    pb, _, _, _ = advance((params2, opts["g"], opts["d"], step2), range(2, 4))

    la, lb = jax.tree.leaves(pa), jax.tree.leaves(pb)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
