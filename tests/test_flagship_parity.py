"""Flagship-scale converted-checkpoint parity, re-proven every round.

BASELINE.md's north star: mel MAE < 1e-3 vs the PyTorch reference given
the same checkpoint weights. The in-suite parity tests use shrunk configs;
this test drives scripts/flagship_parity.py — the UNmodified
config_ljs_dap model_config (1024-wide WN couplings, n_flows 8,
185-symbol table) with injected noise — so the headline number in
README.md is re-measured, not trusted from one run.

The torch side (flagship build + spectral-norm convergence + reference
infer, ~15 min on this host) is cached in .flagship_oracle.npz, versioned
(v2 = WN prediction heads perturbed away from their zero init so the
flows contribute to the compared mel) and otherwise keyed by
torch.manual_seed determinism; with a warm oracle the test costs only
the JAX side (~2-4 min on CPU).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_flagship_parity_mel_mae():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        MATMUL_PRECISION="highest",
        FLAGSHIP_ORACLE=os.path.join(REPO, ".flagship_oracle.npz"),
    )
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "flagship_parity.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
    assert result.returncode == 0, result.stderr[-4000:]
    data = json.loads(result.stdout.strip().splitlines()[-1])
    print(f"flagship parity: {data}")
    assert data["platform"] == "cpu"
    # north star (BASELINE.md): < 1e-3; measured 9.0e-6 (2026-08-19)
    assert data["mel_mae"] < 1e-3, data
    assert data["f0_mae"] < 1e-3, data
