"""Curriculum boundary crossing (reference: train.py:389-414 — the
binarization_start_iter / kl_loss_start_iter schedule).

The step signature CHANGES when a boundary is crossed (binarize False->True
retraces the whole forward; use_kl False->True adds the binarization KL
term): precisely the transition that can work at iter 0 (both flags already
on, tests/test_parallel.py) yet deadlock or silently skip at iter 6000.
These tests cross both boundaries MID-RUN — at the step level, through the
train() entry point, and (tests/test_multihost.py) across the multi-host
AOT barrier."""

import numpy as np
import pytest

import jax

BIN_START, KL_START = 2, 4
N_STEPS = 6


def _schedule(it):
    """Exactly trainer.py's flag derivation (trainer.py:499-500)."""
    binarize = it >= BIN_START
    use_kl = binarize and it >= KL_START
    return binarize, use_kl


@pytest.mark.slow
def test_step_level_crossing_schedule_and_signatures():
    """Drive make_train_step across both boundaries: the binarization loss
    must appear exactly on schedule, every crossed (binarize, use_kl) combo
    must compile as its own signature — and nothing else."""
    from __graft_entry__ import (_LOSS_WEIGHTS, _example_batch,
                                 _flagship_model_config, radtts_init_with)
    from radtts_tpu.train.optim import build_optimizer
    from radtts_tpu.train.trainer import (build_trainable_mask,
                                          make_train_step)

    cfg = _flagship_model_config(small=True)
    params = radtts_init_with(cfg)
    optimizer = build_optimizer("Adam", 1e-4, 0.0, 1.0)
    mask = build_trainable_mask(params, "all", ())
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, _LOSS_WEIGHTS, 1.0, optimizer, mask)
    batch = _example_batch(11, B=2, N=16, T=32,
                           n_mel=cfg["n_mel_channels"])

    rng = jax.random.PRNGKey(0)
    bin_losses, totals = [], []
    for it in range(N_STEPS):
        binarize, use_kl = _schedule(it)
        rng, sub = jax.random.split(rng)
        params, opt_state, total, loss_dict, gn = step(
            params, opt_state, batch, sub, binarize, use_kl)
        totals.append(float(total))
        bin_losses.append(float(loss_dict["binarization_loss"][0]))
        assert np.isfinite(totals[-1]), (it, totals)
        assert np.isfinite(float(gn)), it

    # (a) schedule: zero until BOTH flags are on, strictly positive after
    # (KL of the soft attention against its own hard binarization)
    assert all(v == 0.0 for v in bin_losses[:KL_START]), bin_losses
    assert all(v > 0.0 for v in bin_losses[KL_START:]), bin_losses
    # (b) exactly the crossed signatures compiled: (F,F), (T,F), (T,T)
    assert step._cache_size() == 3


@pytest.mark.slow
def test_train_entry_curriculum_crossing(tmp_path, capsys):
    """The full train() loop crosses both boundaries mid-run: 8-sample
    corpus at batch_size 8 gives one iteration per epoch, so epochs=6 runs
    iterations 0..5 over boundaries at 2 and 4. Asserts the printed
    per-iteration binarization_loss follows the schedule (reference
    semantics: train.py:389-414)."""
    from scipy.io import wavfile

    from tests.test_parallel import _train_cli_config
    from radtts_tpu.train.trainer import train

    # tiny corpus (mirrors tests/test_parallel.py::tiny_corpus, which is a
    # module-scoped fixture and not importable across files)
    sr = 22050
    root = tmp_path / "corpus"
    (root / "wavs").mkdir(parents=True)
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
        wavfile.write(root / "wavs" / name, sr,
                      (y * 32767).astype(np.int16))
        rows.append(f"{name}|{text}|spk0")
    (root / "train.txt").write_text("\n".join(rows[:8]) + "\n")
    (root / "val.txt").write_text(rows[8] + "\n")

    cfg = _train_cli_config(root, tmp_path / "out", 1)
    cfg["train_config"].update(
        epochs=N_STEPS, binarization_start_iter=BIN_START,
        kl_loss_start_iter=KL_START,
        iters_per_checkpoint=100)  # no mid-run validation/checkpoint cost
    train(cfg, **cfg["train_config"])

    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("iter: ")]
    assert len(lines) == N_STEPS, lines
    bin_by_iter = {}
    for ln in lines:
        it = int(ln.split("iter: ")[1].split()[0])
        val = float(ln.split("binarization_loss: ")[1].split()[0])
        bin_by_iter[it] = val
    assert sorted(bin_by_iter) == list(range(N_STEPS))
    for it in range(N_STEPS):
        _, use_kl = _schedule(it)
        if use_kl:
            assert bin_by_iter[it] > 0.0, (it, bin_by_iter)
        else:
            assert bin_by_iter[it] == 0.0, (it, bin_by_iter)
