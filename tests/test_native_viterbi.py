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
