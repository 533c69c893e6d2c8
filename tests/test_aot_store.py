"""Serialized-executable store (radtts_tpu/aot_store.py): the bench.py
cold-start fix on the serving path. On-TPU cold-TTFA impact is measured by
scripts/measure_ttfa.py; these tests force-enable the store on CPU
(RADTTS_AOT_FORCE=1 — same process, same host, so XLA:CPU executables
reload safely) and verify the mechanism: compile-once/persist, reload
instead of recompile, signature keying, and the Synthesizer wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radtts_tpu.aot_store import AOTStore, _arg_signature


@pytest.fixture(autouse=True)
def _force_enable(monkeypatch):
    monkeypatch.setenv("RADTTS_AOT_FORCE", "1")


def test_store_compile_persist_reload(tmp_path):
    """Compile-once/persist, then a fresh store deserializes the artifact.

    EXECUTING a deserialized executable is asserted only on TPU: on the
    CPU backend XLA's cpu_aot_loader flags compile-vs-host machine-
    feature mismatches ('could lead to execution errors such as SIGILL')
    and the reloaded call indeed never completes — while the identical
    path is exercised on the real chip every round (bench.py .bench_aot,
    serve.py cold start via scripts/measure_ttfa.py). Here: compile path
    executes, artifact persists, reload deserializes successfully."""
    jitted = jax.jit(lambda x: x @ x.T + 1.0)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((8, 4)).astype(np.float32))

    store = AOTStore.open(str(tmp_path), extra=("t1",))
    assert store is not None
    wrapped = store.wrap("mm", jitted)
    got = wrapped(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(jitted(x)))
    files = list(tmp_path.glob("mm-*.aot"))
    assert len(files) == 1 and files[0].stat().st_size > 0
    # second call hits the in-memory executable (no second file/compile)
    wrapped(x)
    assert len(list(tmp_path.glob("mm-*.aot"))) == 1

    # a FRESH store (new-process stand-in) deserializes rather than
    # recompiles: _load must return a loaded Compiled for the same key
    store2 = AOTStore.open(str(tmp_path), extra=("t1",))
    key = files[0].name.rsplit("-", 1)[0]
    exe = store2._load(key)
    assert exe is not None and hasattr(exe, "__call__")


def test_store_signature_keying(tmp_path):
    store = AOTStore.open(str(tmp_path), extra=())
    jitted = jax.jit(lambda x: x * 2.0)
    a, b = jnp.ones((4,)), jnp.ones((8,))
    w = store.wrap("f", jitted)
    np.testing.assert_array_equal(np.asarray(w(a)), 2 * np.ones(4))
    np.testing.assert_array_equal(np.asarray(w(b)), 2 * np.ones(8))
    assert len(list(tmp_path.glob("f-*.aot"))) == 2
    # structure (None vs array kwarg) is part of the signature
    assert (_arg_signature((a,), {"m": None})
            != _arg_signature((a,), {"m": a}))


def test_store_fingerprint_separates_configs(tmp_path):
    s1 = AOTStore.open(str(tmp_path), extra=("cfgA",))
    s2 = AOTStore.open(str(tmp_path), extra=("cfgB",))
    assert s1.fingerprint != s2.fingerprint


def test_store_disabled_without_force(tmp_path, monkeypatch):
    monkeypatch.delenv("RADTTS_AOT_FORCE", raising=False)
    # the suite runs on the CPU backend (conftest): must refuse
    assert AOTStore.open(str(tmp_path)) is None
    assert AOTStore.open("") is None


def test_synthesizer_aot_roundtrip(tmp_path):
    """Synthesizer with aot_dir: the first instance synthesizes through
    the store (compile path) and persists fold/dur/decode executables;
    every persisted artifact deserializes in a fresh store. (Executing
    reloaded executables is TPU-only — see
    test_store_compile_persist_reload — and is measured end-to-end on
    chip by scripts/measure_ttfa.py.)"""
    from tests.test_bf16_weights import _mk_synth_kw

    s1 = _mk_synth_kw(weight_dtype="float32", aot_dir=str(tmp_path))
    assert s1._aot is not None
    text = "The store keeps executables."
    w1, _ = s1.synthesize(text, "spk", denoising_strength=0.01)
    assert np.isfinite(w1[0]).all()
    files = sorted(tmp_path.glob("*.aot"))
    names = sorted(p.name.split("-")[0] for p in files)
    assert "fold" in names and "dur" in names
    assert any(n.startswith("dec") for n in names)

    s2 = _mk_synth_kw(weight_dtype="float32", aot_dir=str(tmp_path))
    for p in files:
        key = p.name.rsplit("-", 1)[0]
        assert s2._aot._load(key) is not None, key
