"""End-to-end smoke: synthetic dataset -> loader -> jitted train steps
(both curriculum phases) -> checkpoint save/load -> warmstart filters."""

import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

import jax
import jax.numpy as jnp

from radtts_tpu.data.dataset import Data, DataCollate, DataLoader
from radtts_tpu.models.radtts import radtts_init
from radtts_tpu.train.checkpoint import (load_checkpoint, save_checkpoint,
                                         tree_to_flat_dict)
from radtts_tpu.train.optim import build_optimizer
from radtts_tpu.train.trainer import (build_trainable_mask, make_eval_step,
                                      make_mesh, make_train_step,
                                      shard_batch)
from tests.small_model import MODEL_CONFIG

SR = 22050

DATA_CONFIG = {
    "dur_min": 0.05, "dur_max": 10.0,
    "sampling_rate": SR, "filter_length": 1024, "hop_length": 256,
    "win_length": 1024, "n_mel_channels": MODEL_CONFIG["n_mel_channels"],
    "mel_fmin": 0.0, "mel_fmax": 8000.0, "f0_min": 80.0, "f0_max": 640.0,
    "max_wav_value": 32768.0, "use_f0": True, "use_log_f0": False,
    "use_energy_avg": True, "use_scaled_energy": True,
    "symbol_set": "radtts", "cleaner_names": ["radtts_cleaners"],
    "heteronyms_path": "radtts_tpu/text/assets/heteronyms",
    "phoneme_dict_path": "radtts_tpu/text/assets/cmudict-0.7b",
    "p_phoneme": 1.0, "handle_phoneme": "word",
    "handle_phoneme_ambiguous": "ignore", "include_speakers": None,
    "n_frames": -1, "use_attn_prior_masking": True,
    "prepend_space_to_text": True, "append_space_to_text": True,
    "add_bos_eos_to_text": False, "betabinom_scaling_factor": 1.0,
    "distance_tx_unvoiced": False, "mel_noise_scale": 0.0,
}

TEXTS = ["The cat sat.", "A big dog ran fast!", "Hello world again.",
         "Testing one two three."]


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i, text in enumerate(TEXTS):
        dur_s = 0.4 + 0.1 * i
        t = np.arange(int(SR * dur_s)) / SR
        f = 150 + 30 * i
        y = 0.4 * np.sin(2 * np.pi * f * t)
        y += 0.02 * rng.standard_normal(len(t))
        wav = (y * 32767).astype(np.int16)
        name = f"utt{i}.wav"
        wavfile.write(wav_dir / name, SR, wav)
        spk = "spk0" if i % 2 == 0 else "spk1"
        rows.append(f"{name}|{text}|{spk}")
    (root / "train.txt").write_text("\n".join(rows[:3]) + "\n")
    (root / "val.txt").write_text(rows[3] + "\n")
    cache = root / "cache"
    cache.mkdir()
    return root, cache


def _make_data(root, cache, filelist):
    return Data({"TINY": {"basedir": str(root), "audiodir": "wavs",
                          "filelist": filelist, "lmdbpath": ""}},
                betabinom_cache_path=str(cache), lmdb_cache_path="",
                **DATA_CONFIG)


def test_dataset_and_collate(tiny_dataset):
    root, cache = tiny_dataset
    ds = _make_data(root, cache, "train.txt")
    sample = ds[0]
    assert sample["mel"].ndim == 2 and sample["mel"].shape[1] == 20
    assert sample["f0"].shape[0] >= sample["mel"].shape[0] - 2
    assert sample["attn_prior"].shape[0] == sample["mel"].shape[0]

    collate = DataCollate()
    batch = collate([ds[i] for i in range(3)])
    assert batch["mel"].shape[0] == 3
    assert batch["mel"].shape[1] % 16 == 0
    assert batch["text"].shape[1] % 16 == 0
    # descending text lengths (encoder packing contract)
    assert (np.diff(batch["input_lengths"]) <= 0).all()


MODEL_CONFIG_TRAIN = dict(MODEL_CONFIG, n_speakers=2)

LOSS_WEIGHTS = {"blank_logprob": -1, "ctc_loss_weight": 0.1,
                "binarization_loss_weight": 1.0, "dur_loss_weight": 1.0,
                "f0_loss_weight": 1.0, "energy_loss_weight": 1.0,
                "vpred_loss_weight": 1.0}


@pytest.mark.slow
def test_train_steps_and_checkpoint(tiny_dataset, tmp_path):
    root, cache = tiny_dataset
    ds = _make_data(root, cache, "train.txt")
    loader = DataLoader(ds, 2, DataCollate(), shuffle=True, seed=0,
                        num_workers=2)
    batch = next(iter(loader))

    params = radtts_init(jax.random.PRNGKey(0), MODEL_CONFIG_TRAIN)
    optimizer = build_optimizer("RAdam", 1e-4, 1e-6, 1.0)
    mask = build_trainable_mask(params, "all", ())
    opt_state = optimizer.init(params)
    step = make_train_step(MODEL_CONFIG_TRAIN, LOSS_WEIGHTS, 1.0, optimizer,
                           mask)

    mesh = make_mesh(jax.devices()[:2])
    sharded = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)

    losses = []
    for i in range(3):
        binarize = i >= 1
        use_kl = i >= 2
        rng, sub = jax.random.split(rng)
        params, opt_state, total, loss_dict, gn = step(
            params, opt_state, sharded, sub, binarize, use_kl)
        total = float(total)
        assert np.isfinite(total), (i, {k: float(v)
                                        for k, (v, w) in loss_dict.items()})
        losses.append(total)
    assert np.isfinite(float(gn))

    # eval step
    eval_step = make_eval_step(MODEL_CONFIG_TRAIN, LOSS_WEIGHTS, 1.0)
    scalars, attn, attn_soft = eval_step(params, sharded)
    assert all(np.isfinite(float(v)) for v in scalars.values())

    # checkpoint roundtrip
    ckpt = str(tmp_path / "model_3")
    save_checkpoint(ckpt, params, opt_state, 3, 1e-4)
    params2, opt_state2, meta = load_checkpoint(ckpt, params, opt_state)
    assert meta["iteration"] == 3
    flat_a = tree_to_flat_dict(params)
    flat_b = tree_to_flat_dict(params2)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_trainable_mask_freezing():
    params = radtts_init(jax.random.PRNGKey(0), MODEL_CONFIG_TRAIN)
    mask = build_trainable_mask(params, "durf0", ())
    flat = tree_to_flat_dict(mask)
    assert flat["dur_pred_layer/bottleneck/proj/b"]
    assert flat["f0_pred_module/bottleneck/proj/b"]
    assert not flat["energy_pred_module/bottleneck/proj/b"]
    assert not flat["embedding/table"]
    # buffers never trainable
    assert not flat["flows/0/inv/p"]
    assert not flat["encoder/lstm/fwd/hh/sn_u"]

    mask_all = build_trainable_mask(params, "all", ())
    flat_all = tree_to_flat_dict(mask_all)
    assert flat_all["embedding/table"]
    assert not flat_all["flows/0/inv/p"]


@pytest.mark.slow
def test_warmstart_from_torch_with_filters(tmp_path):
    """Warmstart from a reference torch checkpoint with the reference's
    substring filters (train.py:159-176; README.md:46-48 documents dropping
    speaker_embedding when changing speaker sets): filtered layers keep our
    init, everything else takes the torch values."""
    import copy

    import torch

    from tests.ref_utils import install_reference
    install_reference()
    from radtts import RADTTS as RefRADTTS

    from radtts_tpu.train.trainer import warmstart

    # the reference can only build 1024-wide WN couplings; drop our
    # small-model override so init shapes agree with the torch checkpoint
    mc = copy.deepcopy(MODEL_CONFIG)
    mc.pop("affine_n_channels", None)

    torch.manual_seed(0)
    ref = RefRADTTS(**copy.deepcopy(mc))
    ckpt = tmp_path / "ref.pt"
    torch.save({"state_dict": ref.state_dict()}, ckpt)

    params = radtts_init(jax.random.PRNGKey(3), mc)
    before = tree_to_flat_dict(params)

    out = warmstart(str(ckpt), params, mc,
                    ignore_layers_warmstart=["speaker_embedding"])
    flat = tree_to_flat_dict(out)

    # filtered layer keeps our init
    np.testing.assert_array_equal(flat["speaker_embedding/table"],
                                  before["speaker_embedding/table"])
    # non-filtered layer takes the torch values
    np.testing.assert_allclose(
        np.asarray(flat["embedding/table"]),
        ref.embedding.weight.detach().numpy(), rtol=1e-6)
    assert not np.allclose(np.asarray(before["embedding/table"]),
                           ref.embedding.weight.detach().numpy())

    # include_layers keeps ONLY matching layers from the checkpoint
    params2 = radtts_init(jax.random.PRNGKey(3), mc)
    before2 = tree_to_flat_dict(params2)
    out2 = warmstart(str(ckpt), params2, mc,
                     include_layers=["embedding"])
    flat2 = tree_to_flat_dict(out2)
    # 'embedding' substring matches both embeddings -> loaded
    np.testing.assert_allclose(
        np.asarray(flat2["embedding/table"]),
        ref.embedding.weight.detach().numpy(), rtol=1e-6)
    # encoder does not match -> keeps init
    enc_key = [k for k in before2 if k.startswith("encoder/")][0]
    np.testing.assert_array_equal(flat2[enc_key], before2[enc_key])


def test_gt_attribute_audio_sample_logged(tmp_path):
    """_log_audio_samples with GT attributes (sigma=-1) must actually emit
    audio (reference train.py:247-295): max_frames rounds UP to a 16*group
    multiple and can exceed the batch's padded T, which used to shape-error
    inside the instability guard and silently skip the sample."""
    import torch

    from radtts_tpu.train.trainer import _log_audio_samples
    from tests.ref_utils import install_reference
    install_reference()
    from hifigan_env import AttrDict
    from hifigan_models import Generator
    from tests.test_cli_inference import HIFIGAN_SMALL

    voc = Generator(AttrDict(dict(HIFIGAN_SMALL)))
    voc_ckpt = tmp_path / "hifigan.pt"
    torch.save({"generator": voc.state_dict()}, voc_ckpt)
    voc_cfg = tmp_path / "hifigan_config.json"
    voc_cfg.write_text(json.dumps(HIFIGAN_SMALL))

    cfg = dict(MODEL_CONFIG_TRAIN, n_mel_channels=80)  # vocoder wants 80
    params = radtts_init(jax.random.PRNGKey(0), cfg)

    # padded T = 48 (multiple of 16, NOT of 16*n_group_size=32): durations
    # summing to 48 give max_frames=64 > 48, exercising the pad path
    B, N, T = 1, 12, 48
    r = np.random.default_rng(0)
    voiced = (r.random((B, T)) > 0.3).astype(np.float32)
    batch = {
        "mel": r.standard_normal((B, T, 80)).astype(np.float32),
        "speaker_ids": np.zeros((B,), np.int64),
        "text": r.integers(1, 180, (B, N)),
        "input_lengths": np.asarray([N]),
        "output_lengths": np.asarray([T]),
        "f0": (r.random((B, T)).astype(np.float32) * 300 + 100) * voiced,
        "voiced_mask": voiced,
        "energy_avg": r.random((B, T)).astype(np.float32),
        "audiopaths": ["fake.wav"],
    }
    dur = np.zeros(N, np.int32)
    dur[:] = T // N
    dur[: T % N] += 1
    attn = np.zeros((1, T, N), np.float32)
    attn[0, np.arange(T), np.repeat(np.arange(N), dur)] = 1.0
    assert int(attn[0].sum()) == 48

    calls = []

    class FakeLogger:
        def add_audio(self, tag, audio, step, sr):
            calls.append((tag, np.asarray(audio)))

    train_config = {"vocoder_checkpoint_path": str(voc_ckpt),
                    "vocoder_config_path": str(voc_cfg),
                    "log_decoder_samples": True,
                    "log_attribute_samples": False}
    _log_audio_samples(0, params, cfg, train_config, batch, attn,
                       FakeLogger(), 22050)
    assert calls, "no audio sample was logged"
    tag, audio = calls[0]
    assert tag == "decoder_sample_gt_attributes"
    assert np.isfinite(audio).all() and audio.size > 0


@pytest.mark.slow
def test_amp_train_step_parity_and_convergence():
    """use_amp=True (bf16 coupling predictor stacks, reference AMP analogue
    train.py:364,416-422): first-step loss/grad-norm must track fp32 within
    bf16 tolerance, and a short single-batch overfit must still converge."""
    from __graft_entry__ import (_LOSS_WEIGHTS, _example_batch,
                                 _flagship_model_config, radtts_init_with)

    cfg = _flagship_model_config(small=True)
    batch = _example_batch(5, B=2, N=16, T=32, n_mel=cfg["n_mel_channels"])
    optimizer = build_optimizer("RAdam", 5e-4, 0.0, 1.0)

    def run(use_amp, n_steps):
        params = radtts_init_with(cfg)
        mask = build_trainable_mask(params, "all", ())
        opt_state = optimizer.init(params)
        step = make_train_step(cfg, _LOSS_WEIGHTS, 1.0, optimizer, mask,
                               use_amp=use_amp)
        rng = jax.random.PRNGKey(0)
        losses, gns = [], []
        for i in range(n_steps):
            rng, sub = jax.random.split(rng)
            params, opt_state, total, _, gn = step(
                params, opt_state, batch, sub, True, False)
            losses.append(float(total))
            gns.append(float(gn))
        return losses, gns

    fp32_losses, fp32_gns = run(False, 2)
    amp_losses, amp_gns = run(True, 25)

    # bf16 predictions perturb s/b mildly; loss and grad norm stay close
    np.testing.assert_allclose(amp_losses[0], fp32_losses[0], rtol=2e-2)
    np.testing.assert_allclose(amp_gns[0], fp32_gns[0], rtol=2e-1)
    # overfit single batch: amp still converges
    assert np.isfinite(amp_losses).all()
    assert amp_losses[-1] < amp_losses[0] - 0.5, (amp_losses[0],
                                                  amp_losses[-1])


@pytest.mark.slow
def test_dataloader_process_pool_matches_threads(tiny_dataset):
    """num_worker_procs>0 (reference's worker-process analogue,
    train.py:151-154): the spawn-pool loader must yield byte-identical
    batches to the in-process thread loader."""
    root, cache = tiny_dataset
    ds = _make_data(root, cache, "train.txt")
    files = {"TINY": {"basedir": str(root), "audiodir": "wavs",
                      "filelist": "train.txt", "lmdbpath": ""}}
    data_config = dict(DATA_CONFIG, training_files=files,
                       betabinom_cache_path=str(cache), lmdb_cache_path="")
    from radtts_tpu.data.dataset import data_factory

    lt = DataLoader(ds, 2, DataCollate(), shuffle=True, seed=3)
    lp = DataLoader(ds, 2, DataCollate(), shuffle=True, seed=3,
                    num_worker_procs=2,
                    worker_init=(data_factory,
                                 (data_config, "training_files",
                                  ds.speaker_ids)))
    try:
        bt_list, bp_list = list(lt), list(lp)
        assert len(bt_list) == len(bp_list) == 1
        for bt, bp in zip(bt_list, bp_list):
            assert set(bt) == set(bp)
            for k in bt:
                if isinstance(bt[k], np.ndarray):
                    np.testing.assert_array_equal(bt[k], bp[k], err_msg=k)
    finally:
        lp.close()


def test_validation_reuses_prebuilt_eval_step(monkeypatch):
    """train() builds the jitted eval step ONCE; repeated validations must
    neither rebuild it (re-trace) nor grow its jit cache (recompile) —
    each validation used to pay a full trace+compile on tunneled backends."""
    import radtts_tpu.train.trainer as trainer_mod
    from radtts_tpu.train.trainer import (compute_validation_loss,
                                          make_eval_step, make_mesh)
    from tests.test_parallel import _fake_val_items
    from __graft_entry__ import _LOSS_WEIGHTS

    cfg = dict(MODEL_CONFIG_TRAIN)
    params = radtts_init(jax.random.PRNGKey(0), cfg)
    valset = _fake_val_items(2, cfg["n_mel_channels"])
    mesh = make_mesh(jax.devices()[:1])
    eval_step = make_eval_step(cfg, LOSS_WEIGHTS, 1.0)

    calls = []
    monkeypatch.setattr(trainer_mod, "make_eval_step",
                        lambda *a, **k: calls.append(1) or eval_step)

    for _ in range(2):
        totals = compute_validation_loss(
            0, params, cfg, _LOSS_WEIGHTS, 1.0, valset, DataCollate(),
            batch_size=2, mesh=mesh, logger=None, eval_step=eval_step)
        assert totals
    assert not calls, "validation rebuilt the eval step"
    if hasattr(eval_step, "_cache_size"):
        # same val shapes -> exactly one compiled executable
        assert eval_step._cache_size() == 1
