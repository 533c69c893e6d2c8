"""Debug-mode numerical sentinels: NaNs raise under debug mode and pass
silently otherwise (reference parity: splines.py:81-82 NaN bin-index raise,
common.py:634-635 out-of-range surfacing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radtts_tpu import debug


@pytest.fixture
def debug_mode():
    debug.enable_numerical_checks(True)
    yield
    debug.enable_numerical_checks(False)


def _nan_attn_case():
    from radtts_tpu.models.radtts import binarize_attention

    attn = np.random.default_rng(0).random((1, 24, 8)).astype(np.float32)
    attn[0, 3, 2] = np.nan
    in_lens = jnp.asarray([8])
    out_lens = jnp.asarray([24])

    def run(a):
        return binarize_attention(a, in_lens, out_lens)

    return jax.jit(run), jnp.asarray(attn)


def test_nan_attention_raises_in_debug_mode(debug_mode):
    run, attn = _nan_attn_case()
    with pytest.raises(Exception) as excinfo:
        run(attn).block_until_ready()
    assert "soft attention" in str(excinfo.value) or "non-finite" in str(
        excinfo.value) or "callback" in str(excinfo.value).lower()


def test_nan_attention_silent_by_default():
    assert not debug.numerical_checks_enabled()
    run, attn = _nan_attn_case()
    out = run(attn)
    out.block_until_ready()  # no raise


def test_nan_spline_input_raises_in_debug_mode(debug_mode):
    from radtts_tpu.ops.splines import piecewise_linear_forward

    x = jnp.asarray(np.array([[0.5, np.nan]], np.float32))
    q = jnp.zeros((1, 2, 8), jnp.float32)
    with pytest.raises(Exception):
        y, _ = jax.jit(piecewise_linear_forward)(x, q)
        y.block_until_ready()


def test_spline_silent_by_default():
    from radtts_tpu.ops.splines import piecewise_linear_forward

    x = jnp.asarray(np.array([[0.5, np.nan]], np.float32))
    q = jnp.zeros((1, 2, 8), jnp.float32)
    y, _ = jax.jit(piecewise_linear_forward)(x, q)
    y.block_until_ready()
