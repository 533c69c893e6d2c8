"""Multi-device sharding: the full dp+tp train step compiles and executes on
an 8-virtual-device CPU mesh, and DP-sharded losses match single-device."""

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip
    assert len(jax.devices()) >= 8
    dryrun_multichip(8)


@pytest.mark.slow
def test_dp_matches_single_device():
    """Same batch, 1-device vs 4-device data-parallel: losses must agree."""
    from __graft_entry__ import (_LOSS_WEIGHTS, _example_batch,
                                 _flagship_model_config, radtts_init_with)
    from radtts_tpu.parallel.mesh import batch_shardings, make_mesh, replicate
    from radtts_tpu.train.optim import build_optimizer
    from radtts_tpu.train.trainer import (build_trainable_mask,
                                          make_train_step)

    cfg = _flagship_model_config(small=True)
    params = radtts_init_with(cfg)
    optimizer = build_optimizer("Adam", 1e-4, 0.0, 1.0)
    mask = build_trainable_mask(params, "all", ())
    opt_state = optimizer.init(params)
    batch = _example_batch(3, B=4, N=16, T=32, n_mel=cfg["n_mel_channels"])
    step = make_train_step(cfg, _LOSS_WEIGHTS, 1.0, optimizer, mask)
    rng = jax.random.PRNGKey(0)

    # deep copies per mesh: the train step donates params/opt_state, and
    # device_put to an identical sharding aliases rather than copies
    import jax.numpy as jnp

    def fresh(tree, mesh):
        return replicate(jax.tree.map(jnp.copy, tree), mesh)

    # single device
    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    p1 = fresh(params, mesh1)
    o1 = fresh(opt_state, mesh1)
    _, _, loss1, _, gn1 = step(p1, o1, batch, rng, True, False)

    # 4-way DP
    mesh4 = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    p4 = fresh(params, mesh4)
    o4 = fresh(opt_state, mesh4)
    b4 = jax.device_put(batch, batch_shardings(batch, mesh4))
    _, _, loss4, _, gn4 = step(p4, o4, b4, rng, True, False)

    np.testing.assert_allclose(float(loss1), float(loss4), rtol=2e-4)
    np.testing.assert_allclose(float(gn1), float(gn4), rtol=2e-3)


@pytest.mark.slow
def test_tp_matches_single_device():
    """2-way tensor parallelism over the WN hidden channels must reproduce
    the single-device loss (the psum over the sharded contraction is the
    only collective XLA inserts)."""
    from __graft_entry__ import (_LOSS_WEIGHTS, _example_batch,
                                 _flagship_model_config, radtts_init_with)
    from radtts_tpu.parallel.mesh import (batch_shardings, make_mesh,
                                          param_shardings, replicate)
    from radtts_tpu.train.optim import build_optimizer
    from radtts_tpu.train.trainer import (build_trainable_mask,
                                          make_train_step)
    import jax.numpy as jnp

    cfg = _flagship_model_config(small=True)
    params = radtts_init_with(cfg)
    optimizer = build_optimizer("Adam", 1e-4, 0.0, 1.0)
    mask = build_trainable_mask(params, "all", ())
    opt_state = optimizer.init(params)
    batch = _example_batch(3, B=2, N=16, T=32, n_mel=cfg["n_mel_channels"])
    step = make_train_step(cfg, _LOSS_WEIGHTS, 1.0, optimizer, mask)
    rng = jax.random.PRNGKey(0)

    def fresh(tree):
        return jax.tree.map(jnp.copy, tree)

    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    _, _, loss1, _, gn1 = step(replicate(fresh(params), mesh1),
                               replicate(fresh(opt_state), mesh1),
                               batch, rng, True, False)

    mesh_tp = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    shardings = param_shardings(params, mesh_tp)
    p_tp = jax.device_put(fresh(params), shardings)
    o_tp = replicate(fresh(opt_state), mesh_tp)
    b_tp = jax.device_put(batch, batch_shardings(batch, mesh_tp))
    _, _, loss_tp, _, gn_tp = step(p_tp, o_tp, b_tp, rng, True, False)

    np.testing.assert_allclose(float(loss1), float(loss_tp), rtol=2e-4)
    np.testing.assert_allclose(float(gn1), float(gn_tp), rtol=2e-3)


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    """8 train + 1 val synthetic wavs with filelists (train() needs a real
    Data pipeline; batch_size=8 divides both the 8-way DP and 4x2 dp*tp
    meshes)."""
    from scipy.io import wavfile

    sr = 22050
    root = tmp_path_factory.mktemp("tp_corpus")
    (root / "wavs").mkdir()
    (root / "cache").mkdir()
    r = np.random.default_rng(0)
    texts = ["The cat sat.", "A dog ran.", "Hello there.", "Go now.",
             "One two.", "Red fox.", "Blue sky.", "Warm sun.", "Old tree."]
    rows = []
    for i, text in enumerate(texts):
        t = np.arange(int(sr * (0.35 + 0.05 * i))) / sr
        y = 0.4 * np.sin(2 * np.pi * (140 + 25 * i) * t)
        y += 0.02 * r.standard_normal(len(t))
        name = f"u{i}.wav"
        wavfile.write(root / "wavs" / name, sr, (y * 32767).astype(np.int16))
        rows.append(f"{name}|{text}|spk0")
    (root / "train.txt").write_text("\n".join(rows[:8]) + "\n")
    (root / "val.txt").write_text(rows[8] + "\n")
    return root


def _train_cli_config(root, outdir, n_model):
    """Full 4-block config as the train.py CLI would assemble it."""
    from tests.small_model import MODEL_CONFIG
    from tests.test_train_e2e import DATA_CONFIG

    del n_model  # applied by the caller via update_params
    files = {"TINY": {"basedir": str(root), "audiodir": "wavs",
                      "filelist": None, "lmdbpath": ""}}
    data_config = dict(DATA_CONFIG,
                       training_files={"TINY": dict(files["TINY"],
                                                    filelist="train.txt")},
                       validation_files={"TINY": dict(files["TINY"],
                                                      filelist="val.txt")},
                       betabinom_cache_path=str(root / "cache"),
                       lmdb_cache_path="")
    train_config = {
        "output_directory": str(outdir), "epochs": 1,
        "optim_algo": "RAdam", "learning_rate": 1e-4, "weight_decay": 1e-6,
        "sigma": 1.0, "iters_per_checkpoint": 50, "batch_size": 8,
        "seed": 0, "checkpoint_path": "", "ignore_layers": [],
        "ignore_layers_warmstart": [], "include_layers": [],
        "finetune_layers": [], "warmstart_checkpoint_path": "",
        "use_amp": False, "grad_clip_val": 1.0,
        "loss_weights": dict(__import__("__graft_entry__")._LOSS_WEIGHTS),
        "binarization_start_iter": 0, "kl_loss_start_iter": 0,
        "unfreeze_modules": "all",
    }
    return {"train_config": train_config, "data_config": data_config,
            "dist_config": {"dist_backend": "nccl", "n_model": 1},
            "model_config": dict(MODEL_CONFIG, n_speakers=1)}


@pytest.mark.slow
def test_train_entry_tp_matches_dp(tiny_corpus, tmp_path):
    """`-p dist_config.n_model=2` through the train() entry point (the same
    code path the CLI drives) must reproduce the pure-DP parameters after a
    real optimizer step — TP is user-launchable, not just dryrun-provable
    (reference parallelism is CLI-reachable, train.py:488-491)."""
    from radtts_tpu.config import update_params
    from radtts_tpu.train.checkpoint import tree_to_flat_dict
    from radtts_tpu.train.trainer import train

    results = {}
    for n_model in (1, 2):
        cfg = _train_cli_config(tiny_corpus, tmp_path / f"out{n_model}", 1)
        # dot-path override exactly as the CLI would apply it
        update_params(cfg, [f"dist_config.n_model={n_model}"])
        assert cfg["dist_config"]["n_model"] == n_model
        params = train(cfg, **cfg["train_config"])
        results[n_model] = tree_to_flat_dict(params)

    flat1, flat2 = results[1], results[2]
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_allclose(
            np.asarray(flat1[k]), np.asarray(flat2[k]),
            rtol=2e-3, atol=1e-6, err_msg=k)


def _fake_val_items(n_items, n_mel, seed=0):
    """Synthetic per-sample dicts shaped like Data.__getitem__ output."""
    r = np.random.default_rng(seed)
    items = []
    for i in range(n_items):
        N, T = 12 + i, 40 + 4 * i
        items.append({
            "text_encoded": r.integers(1, 100, (N,)),
            "mel": r.standard_normal((T, n_mel)).astype(np.float32),
            "speaker_id": 0,
            "audiopath": f"fake_{i}.wav",
            "f0": (r.random(T) * 200 + 100).astype(np.float32),
            "p_voiced": (r.random(T) > 0.3).astype(np.float32),
            "voiced_mask": (r.random(T) > 0.3).astype(np.float32),
            "energy_avg": r.random(T).astype(np.float32),
            "attn_prior": (r.random((T, N)) * 0.5 + 0.25).astype(
                np.float32),
        })
    return items


def test_validation_remainder_batch_on_8_devices():
    """len(valset)=3, batch_size=8 on an 8-device mesh: the remainder batch
    must be wrap-padded to a device multiple instead of crashing device_put
    (reference validation runs on all ranks, train.py:200-297)."""
    from radtts_tpu.data.dataset import DataCollate
    from radtts_tpu.models.radtts import radtts_init
    from radtts_tpu.train.trainer import (compute_validation_loss,
                                          make_mesh)
    from tests.small_model import MODEL_CONFIG
    from __graft_entry__ import _LOSS_WEIGHTS

    assert len(jax.devices()) >= 8
    mesh = make_mesh(jax.devices()[:8])
    cfg = dict(MODEL_CONFIG, n_speakers=2)
    params = radtts_init(jax.random.PRNGKey(0), cfg)
    valset = _fake_val_items(3, cfg["n_mel_channels"])
    totals = compute_validation_loss(
        0, params, cfg, _LOSS_WEIGHTS, 1.0, valset, DataCollate(),
        batch_size=8, mesh=mesh, logger=None)
    assert totals and all(np.isfinite(v) for v in totals.values()), totals


def test_loader_rank_sharding_covers_equally():
    """Multi-host dataset sharding (reference: DistributedSampler,
    train.py:147-149): every rank gets the SAME sample count and batch
    schedule — unequal counts would strand one rank in a collective no
    other rank joins — via wrap-padding, with the union covering the
    dataset and duplicates bounded by the pad."""
    from radtts_tpu.data.dataset import DataLoader

    dataset = list(range(23))  # 23 % 4 != 0: forces the wrap-pad
    seen, counts, batch_sizes = [], [], []
    for rank in range(4):
        loader = DataLoader(dataset, 2, lambda items: items, shuffle=True,
                            seed=7, rank=rank, world_size=4,
                            drop_last=False)
        loader.set_epoch(3)
        batches = loader._indices()
        counts.append(sum(len(b) for b in batches))
        batch_sizes.append([len(b) for b in batches])
        seen.append([int(i) for i in np.concatenate(batches)])
    # equal count AND identical per-batch sizes on every rank
    assert len(set(counts)) == 1
    assert all(bs == batch_sizes[0] for bs in batch_sizes)
    union = set().union(*(set(s) for s in seen))
    assert union == set(range(23))
    # only the wrap-pad duplicates: 24 total draws over 23 samples
    assert sum(len(s) for s in seen) == 24
    # deterministic given (seed, epoch)
    loader2 = DataLoader(dataset, 2, lambda items: items, shuffle=True,
                         seed=7, rank=1, world_size=4, drop_last=False)
    loader2.set_epoch(3)
    assert [int(i) for i in np.concatenate(loader2._indices())] == seen[1]

    # drop_last=True (training): equal BATCH counts across ranks for an
    # n that previously gave rank 0 an extra batch (39 -> 20/19 split)
    n_b = []
    for rank in range(2):
        loader = DataLoader(list(range(39)), 10, lambda x: x, shuffle=True,
                            seed=7, rank=rank, world_size=2,
                            drop_last=True)
        n_b.append(len(loader._indices()))
    assert n_b[0] == n_b[1] == 2

    # dataset SMALLER than the world: every rank must still get one
    # sample (cyclic repetition), not [1, 1, 0, 0]
    per_rank = []
    for rank in range(4):
        loader = DataLoader(list(range(1)), 1, lambda x: x, shuffle=False,
                            rank=rank, world_size=4, drop_last=False)
        per_rank.append(sum(len(b) for b in loader._indices()))
    assert per_rank == [1, 1, 1, 1]


@pytest.mark.slow
def test_dp_inference_matches_single_device():
    """Batched inference (radtts_infer + vocoder) sharded over the data
    axis on a 4-device mesh must reproduce single-device mels/audio —
    the serving-scale deployment path (one replica per mesh row)."""
    from __graft_entry__ import _flagship_model_config, radtts_init_with
    from radtts_tpu.models.hifigan import (hifigan_generator_apply,
                                           hifigan_generator_init)
    from radtts_tpu.models.radtts import radtts_infer
    from radtts_tpu.ops.invertible import precompute_inverses
    from radtts_tpu.parallel.mesh import make_mesh, replicate
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax.numpy as jnp

    cfg = _flagship_model_config(small=True)
    params = precompute_inverses(radtts_init_with(cfg))
    voc = hifigan_generator_init(jax.random.PRNGKey(1), {
        "resblock": "1", "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 64,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5]] * 3})

    B, N, T = 4, 16, 32
    r = np.random.default_rng(0)
    text = jnp.asarray(r.integers(1, 100, (B, N)))
    spk = jnp.zeros((B,), jnp.int32)
    dur = jnp.full((B, N), T // N, jnp.int32)
    rng = jax.random.PRNGKey(3)

    @jax.jit
    def synth(params, voc, rng, spk, text, dur):
        out = radtts_infer(params, rng, spk, text, 0.8, T, dur=dur,
                           sigma_f0=1.0, sigma_energy=1.0)
        return out["mel"], hifigan_generator_apply(voc, out["mel"])

    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    mel1, audio1 = synth(replicate(params, mesh1), replicate(voc, mesh1),
                         rng, spk, text, dur)

    mesh4 = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    dp = NamedSharding(mesh4, P("data"))
    mel4, audio4 = synth(
        replicate(params, mesh4), replicate(voc, mesh4), rng,
        jax.device_put(spk, dp), jax.device_put(text, dp),
        jax.device_put(dur, dp))

    np.testing.assert_allclose(np.asarray(mel4), np.asarray(mel1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(audio4), np.asarray(audio1),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_synthesizer_data_parallel_matches_single():
    """User-launchable DP serving (`--data_parallel`): a Synthesizer built
    with data_parallel=4 must reproduce the data_parallel=1 waveforms for
    an exact-multiple batch (same seed => identical draws), and a
    non-multiple batch pads by repeating the last item but returns only
    the requested wavs."""
    from radtts_tpu.models.hifigan import (denoiser_init,
                                           hifigan_generator_init)
    from radtts_tpu.models.radtts import radtts_init
    from radtts_tpu.synthesizer import Synthesizer
    from tests.small_model import MODEL_CONFIG
    from tests.test_synthesizer import H_SMALL, _encode

    cfg = dict(MODEL_CONFIG, n_mel_channels=80)
    params = radtts_init(jax.random.PRNGKey(0), cfg)
    voc = hifigan_generator_init(jax.random.PRNGKey(1), H_SMALL)
    den = denoiser_init(voc)

    def mk(dp):
        return Synthesizer.from_parts(
            cfg, params, voc, den, encode_fn=_encode,
            speaker_id_fn=lambda name: 0, seed=11, data_parallel=dp)

    texts = ["An exact multiple batch.", "Second line to speak.",
             "Third line of text here.", "Fourth and final line."]
    w1, a1 = mk(1).synthesize(texts, "spk", denoising_strength=0.01)
    s4 = mk(4)
    w4, a4 = s4.synthesize(texts, "spk", denoising_strength=0.01)
    np.testing.assert_array_equal(a4["dur"], a1["dur"])
    for x, y in zip(w4, w1):
        np.testing.assert_allclose(x, y, rtol=1e-3, atol=1e-4)

    # non-multiple batch: B pads 3 -> 4 (repeat last); exactly 3 wavs back
    w3, a3 = s4.synthesize(texts[:3], "spk")
    assert len(w3) == 3 and a3["dur"].shape[0] == 3
    assert all(len(w) > 0 for w in w3)
