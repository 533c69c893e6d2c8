"""README self-reported numbers must be generated, not typed (the drift
class flagged in rounds 3 and 4: test counts / wall times / RTF figures
disagreeing between README sections). scripts/readme_stats.py renders the
marked block from docs/stats.json + .bench_baseline.json; here the quick
tier asserts the committed README equals that render, and the slow tier
re-collects the tiers live against the committed counts."""

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "readme_stats.py")


def test_readme_block_matches_sources():
    out = subprocess.run([sys.executable, SCRIPT, "--check"], cwd=REPO,
                         capture_output=True, text=True)
    assert out.returncode == 0, f"{out.stdout}\n{out.stderr}"


def test_no_stale_counts_outside_block():
    """The block is the ONLY place in README that states tier counts or
    an RTF value: any other 'NNN tests' or 'RTF 0.00xxx' literal is a
    future drift waiting to happen."""
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    block = re.search(r"<!-- readme-stats:begin.*?readme-stats:end -->",
                      text, re.DOTALL)
    assert block, "generated block missing"
    outside = text.replace(block.group(0), "")
    assert not re.search(r"\b\d{2,4} tests\b", outside), (
        re.search(r".{60}\b\d{2,4} tests\b.{20}", outside, re.DOTALL)
        .group(0))
    assert not re.search(r"RTF \*?\*?0\.0+\d", outside), (
        re.search(r".{60}RTF \*?\*?0\.0+\d.{20}", outside, re.DOTALL)
        .group(0))


@pytest.mark.slow
def test_committed_counts_match_live_collection():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from readme_stats import collect_count

    with open(os.path.join(REPO, "docs", "stats.json")) as f:
        stats = json.load(f)
    assert collect_count(["-m", "not slow"]) == stats["quick_tests"]
    assert collect_count() == stats["full_tests"]
