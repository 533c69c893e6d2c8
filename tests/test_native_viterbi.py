"""C++ pYIN-Viterbi kernel: exact equality against the numpy oracle."""

import numpy as np
import pytest

from radtts_tpu.native import viterbi_log_native


def _numpy_viterbi(log_obs, log_trans, log_p_init):
    # the pure-numpy fallback inside radtts_tpu.data.pyin._viterbi_log
    T, S = log_obs.shape
    delta = log_p_init + log_obs[0]
    psi = np.zeros((T, S), dtype=np.int32)
    for t in range(1, T):
        scores = delta[:, None] + log_trans
        psi[t] = np.argmax(scores, axis=0)
        delta = scores[psi[t], np.arange(S)] + log_obs[t]
    states = np.zeros(T, dtype=np.int32)
    states[-1] = int(np.argmax(delta))
    for t in range(T - 2, -1, -1):
        states[t] = psi[t + 1][states[t + 1]]
    return states


@pytest.mark.parametrize("seed,T,S", [(0, 50, 40), (1, 200, 300), (2, 7, 2)])
def test_native_viterbi_exact(seed, T, S):
    lib = viterbi_log_native(np.zeros((2, 2)), np.zeros((2, 2)),
                             np.zeros(2))
    if lib is None:
        pytest.skip("no C++ toolchain available")
    rng = np.random.default_rng(seed)
    log_obs = np.log(rng.random((T, S)) + 1e-12)
    trans = rng.random((S, S))
    trans /= trans.sum(1, keepdims=True)
    log_trans = np.log(trans + 1e-300)
    log_p_init = np.log(rng.random(S) + 1e-12)
    nat = viterbi_log_native(log_obs, log_trans, log_p_init)
    ref = _numpy_viterbi(log_obs, log_trans, log_p_init)
    np.testing.assert_array_equal(nat, ref)


def test_native_viterbi_ties_break_like_numpy():
    if viterbi_log_native(np.zeros((2, 2)), np.zeros((2, 2)),
                          np.zeros(2)) is None:
        pytest.skip("no C++ toolchain available")
    # all-equal scores: argmax must pick the first index everywhere
    T, S = 5, 8
    log_obs = np.zeros((T, S))
    log_trans = np.zeros((S, S))
    log_p_init = np.zeros(S)
    nat = viterbi_log_native(log_obs, log_trans, log_p_init)
    ref = _numpy_viterbi(log_obs, log_trans, log_p_init)
    np.testing.assert_array_equal(nat, ref)


def _pyin_transition(N=73, half=9, switch_prob=0.01):
    from radtts_tpu.data.pyin import _transition_local
    L = _transition_local(N, 2 * half + 1)
    p = switch_prob
    trans = np.block([[(1 - p) * L, p * L], [p * L, (1 - p) * L]])
    eps = np.finfo(np.float64).tiny
    return np.log(trans + eps)


def test_banded_structure_detection():
    from radtts_tpu.native import banded_structure
    lt = _pyin_transition(N=73, half=9)
    got = banded_structure(lt)
    assert got is not None and got[0] == 73 and got[1] == 9
    # a dense random matrix must NOT be detected
    rng = np.random.default_rng(0)
    dense = np.log(rng.random((40, 40)) + 1e-12)
    assert banded_structure(dense) is None
    # breaking one out-of-band entry must break detection
    lt2 = lt.copy()
    lt2[0, 40] += 1.0
    assert banded_structure(lt2) is None


@pytest.mark.parametrize("seed", [0, 1])
def test_banded_viterbi_exact_on_pyin_transition(seed):
    """The banded kernel must equal the numpy oracle bit-for-bit on the
    real pYIN transition structure, including paths that jump OUTSIDE the
    band (observations alternate between far-apart pitch bins, so the
    optimal path must take out-of-band log(eps) transitions)."""
    if viterbi_log_native(np.zeros((2, 2)), np.zeros((2, 2)),
                          np.zeros(2)) is None:
        pytest.skip("no C++ toolchain available")
    N, half = 73, 9
    lt = _pyin_transition(N=N, half=half)
    S = 2 * N
    eps = np.finfo(np.float64).tiny
    rng = np.random.default_rng(seed)
    T = 60
    obs = np.zeros((T, S))
    for t in range(T):
        # sparse voiced candidates; every 7 frames teleport across bins
        base = (t // 7 * 31) % N
        idx = (base + rng.integers(0, 4, size=3)) % N
        v = rng.random(3)
        obs[t, idx] = v
        obs[t, N:] = max(0.0, 1 - v.sum()) / N
    lo = np.log(obs + eps)
    lpi = np.log(np.concatenate([np.zeros(N), np.full(N, 1 / N)]) + eps)
    nat = viterbi_log_native(lo, lt, lpi)
    ref = _numpy_viterbi(lo, lt, lpi)
    np.testing.assert_array_equal(nat, ref)
