"""Template-first checkpoint loading (load_radtts_for_inference): the
eval_shape template must reproduce the full-init load bit-for-bit for a
complete checkpoint (native npz AND torch), and fall back to real init
for a partial one.

Reference anchor: inference.py:80-100 (per-process model construction the
template path accelerates — the reference always pays a full random init
before load_state_dict)."""

import numpy as np
import jax
import pytest

from tests.small_model import MODEL_CONFIG

from radtts_tpu.models.radtts import radtts_init, radtts_template
from radtts_tpu.train.checkpoint import (load_radtts_for_inference,
                                         save_checkpoint)


@pytest.fixture(scope="module")
def real_params():
    return radtts_init(jax.random.PRNGKey(3), MODEL_CONFIG)


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, leaf in la:
        other = lb[path]
        assert np.asarray(leaf).dtype == np.asarray(other).dtype, path
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(other), err_msg=str(path))


def test_template_matches_init_structure():
    tmpl = radtts_template(MODEL_CONFIG)
    real = radtts_init(jax.random.PRNGKey(0), MODEL_CONFIG)
    ta, tb = (jax.tree_util.tree_structure(t) for t in (tmpl, real))
    assert ta == tb
    for a, b in zip(jax.tree_util.tree_leaves(tmpl),
                    jax.tree_util.tree_leaves(real)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_native_npz_template_load_bit_equal(tmp_path, real_params):
    ck = str(tmp_path / "small.npz")
    save_checkpoint(ck, real_params, iteration=5)
    loaded, meta = load_radtts_for_inference(ck, MODEL_CONFIG)
    assert meta["iteration"] == 5
    _assert_trees_equal(loaded, real_params)


def test_torch_checkpoint_template_load(tmp_path, real_params):
    # export to the reference-strict torch format, then load it back
    # through the template path: same values as loading via a real-init
    # template (the converter only reads _meta/_kind/structure from the
    # template, radtts_tpu/convert.py:326-335)
    import torch

    from radtts_tpu.export import radtts_to_torch
    from radtts_tpu.train.checkpoint import load_any_radtts_checkpoint

    ck = str(tmp_path / "small_torch.pt")
    torch.save({"state_dict": radtts_to_torch(real_params),
                "iteration": 7}, ck)
    via_template, meta = load_radtts_for_inference(ck, MODEL_CONFIG)
    assert meta["iteration"] == 7
    via_init, _ = load_any_radtts_checkpoint(
        ck, MODEL_CONFIG, radtts_init(jax.random.PRNGKey(9), MODEL_CONFIG))
    _assert_trees_equal(via_template, via_init)


def test_partial_checkpoint_still_raises(tmp_path, real_params):
    # unchanged strictness: an inference checkpoint missing a leaf raises
    # (via both the template path and the full-init fallback), exactly as
    # the pre-template loader did — partial loads belong to the trainer's
    # filtered warmstart path, not inference
    from radtts_tpu.train.checkpoint import tree_to_flat_dict

    flat = tree_to_flat_dict(real_params)
    flat.pop(sorted(flat)[0])
    ck = str(tmp_path / "partial.npz")
    np.savez(ck, **{f"params/{k}": v for k, v in flat.items()})
    with pytest.raises(KeyError, match="missing"):
        load_radtts_for_inference(ck, MODEL_CONFIG)


def test_template_failure_falls_back(tmp_path, real_params, monkeypatch,
                                     capsys):
    # if the shape pass itself breaks (e.g. a future init gains an
    # untraceable op), the loader must degrade to the full-init path
    import radtts_tpu.models.radtts as radtts_mod

    def boom(model_config):
        raise RuntimeError("untraceable init")

    monkeypatch.setattr(radtts_mod, "radtts_template", boom)
    ck = str(tmp_path / "small2.npz")
    save_checkpoint(ck, real_params, iteration=2)
    loaded, meta = load_radtts_for_inference(ck, MODEL_CONFIG)
    assert "falling back to full init" in capsys.readouterr().out
    assert meta["iteration"] == 2
    _assert_trees_equal(loaded, real_params)
