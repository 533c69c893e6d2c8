"""Multi-host training path: two real processes under
jax.distributed.initialize (CPU backend, local gRPC coordinator) must
reproduce the single-process loss/grad-norm — exercising the
make_array_from_process_local_data branch of trainer.shard_batch and the
train.py RANK/WORLD_SIZE launch contract (reference: distributed.py:48-64,
train.py:488-491)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "mh_child.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_world(world, devices_per_proc, timeout=900, extra_env=None):
    port = str(_free_port())
    env_base = dict(os.environ)
    env_base.pop("XLA_FLAGS", None)  # conftest's 8-device flag must not leak
    procs = []
    for rank in range(world):
        env = dict(env_base,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS=f"--xla_force_host_platform_device_count="
                             f"{devices_per_proc}",
                   MH_RANK=str(rank), MH_WORLD=str(world), MH_PORT=port,
                   **(extra_env or {}))
        procs.append(subprocess.Popen(
            [sys.executable, CHILD], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    try:
        outs = [p.communicate(timeout=timeout) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-4000:]
    for so, _ in outs:
        for line in so.splitlines():
            if line.startswith("MH_RESULT "):
                return json.loads(line[len("MH_RESULT "):])
    raise AssertionError(f"no MH_RESULT in output: {outs}")


@pytest.mark.slow
def test_two_process_divergent_buckets():
    # ranks whose independently-collated batches land in DIFFERENT padded
    # buckets: shard_batch must sync all ranks to the global max bucket
    # before assembling the global array (without the sync this crashes in
    # make_array_from_process_local_data). Dropout noise is shape-
    # dependent, so only execution + finiteness is asserted here; exact
    # loss parity is the test below.
    multi = _run_world(2, 2, extra_env={"MH_PAD_SKEW": "1"})
    assert len(multi) == 2
    for loss, gn in multi:
        assert np.isfinite(loss) and np.isfinite(gn)


@pytest.mark.slow
def test_two_process_curriculum_crossing():
    # both curriculum boundaries (binarize at iter 2, +KL at iter 4 —
    # reference train.py:389-414) crossed MID-RUN under the multi-host AOT
    # barrier: each flip is a new step signature that every rank must
    # compile + barrier before any rank executes it. Asserts the
    # binarization loss follows the schedule and exactly the three crossed
    # signatures were AOT'd.
    res = _run_world(2, 2, extra_env={"MH_CURRICULUM": "1"})
    steps = res["steps"]
    assert len(steps) == 6
    for it, (loss, gn, bin_loss) in enumerate(steps):
        assert np.isfinite(loss) and np.isfinite(gn), (it, steps)
        if it >= 4:
            assert bin_loss > 0.0, (it, steps)
        else:
            assert bin_loss == 0.0, (it, steps)
    assert res["aot_signatures"] == 3


@pytest.mark.slow
def test_two_process_matches_single_process():
    # 2 processes x 2 local devices == 1 process x 4 devices, same global
    # batch: per-step losses and grad norms must agree
    multi = _run_world(2, 2)
    single = _run_world(1, 4)
    assert len(multi) == len(single) == 2
    for (lm, gm), (ls, gs) in zip(multi, single):
        np.testing.assert_allclose(lm, ls, rtol=2e-4)
        np.testing.assert_allclose(gm, gs, rtol=2e-3)
