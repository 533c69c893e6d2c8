"""Packaging metadata stays in sync with the package tree.

The library installs via pyproject.toml (`pip install .`); the
reference-shaped CLIs stay repo-root scripts (same invocation surface as
the reference, reference: README.md:50-51). These tests guard the two
ways the metadata can silently rot: a new subpackage not listed in
[tool.setuptools].packages, and a new data file not covered by
package-data.
"""
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_pyproject():
    try:
        import tomllib
    except ImportError:  # pragma: no cover - py<3.11
        pytest.skip("tomllib unavailable")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_all_subpackages_listed():
    cfg = _load_pyproject()
    listed = set(cfg["tool"]["setuptools"]["packages"])
    actual = set()
    for dirpath, dirnames, filenames in os.walk(
            os.path.join(REPO, "radtts_tpu")):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        if "__init__.py" in filenames:
            rel = os.path.relpath(dirpath, REPO)
            actual.add(rel.replace(os.sep, "."))
    assert listed == actual, (
        f"pyproject packages out of sync: missing={actual - listed}, "
        f"stale={listed - actual}")


def test_package_data_covers_assets():
    cfg = _load_pyproject()
    data = cfg["tool"]["setuptools"]["package-data"]
    assert "assets/*" in data["radtts_tpu.text"]
    assert "viterbi.cpp" in data["radtts_tpu.native"]
    # the files those globs promise actually exist
    assert os.path.exists(os.path.join(
        REPO, "radtts_tpu/text/assets/cmudict-0.7b"))
    assert os.path.exists(os.path.join(
        REPO, "radtts_tpu/native/viterbi.cpp"))
