"""Fused Pallas MRF kernel vs the XLA resblock path (interpret mode on CPU).

The kernel must reproduce the reference ResBlock1 semantics exactly,
including the zero-padding every conv sees at the true sequence ends
(reference: hifigan_models.py:83-118) — the fused chain has to re-zero
out-of-range intermediates or boundary frames diverge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radtts_tpu.models.hifigan import (hifigan_generator_apply,
                                       hifigan_generator_init,
                                       _resblock1_apply)
from radtts_tpu.ops.pallas_mrf import mrf_weights_from_params, pallas_mrf

H_V1 = {
    "resblock": "1",
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 512,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
}

RK = (3, 7, 11)
RD = ((1, 3, 5),) * 3


@pytest.fixture(scope="module")
def voc():
    return hifigan_generator_init(jax.random.PRNGKey(1), H_V1)


@pytest.mark.parametrize("stage,T,C", [(3, 1000, 32), (2, 700, 64),
                                       (1, 300, 128)])
def test_pallas_mrf_matches_xla(voc, stage, T, C):
    rng = np.random.default_rng(stage)
    x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
    xs = jnp.zeros_like(x)
    for j, block in enumerate(voc["resblocks"][stage]):
        xs = xs + _resblock1_apply(block, x, RK[j], RD[j])
    ref = xs / 3
    w = mrf_weights_from_params(voc["resblocks"][stage])
    out = pallas_mrf(x, w, tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_generator_pallas_impl_matches_xla(voc):
    """Full generator with mrf_impl=pallas (interpret) == default path."""
    from radtts_tpu.ops import pallas_mrf as pm
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 40, 80)).astype(np.float32))
    y_xla = hifigan_generator_apply(voc, mel)

    orig = pm.pallas_mrf
    orig_folded = pm.pallas_mrf_folded

    def interp(x, w, **kw):
        kw["interpret"] = True
        return orig(x, w, **kw)

    def interp_folded(x, w, **kw):
        kw["interpret"] = True
        return orig_folded(x, w, **kw)

    pm.pallas_mrf = interp
    pm.pallas_mrf_folded = interp_folded
    try:
        import radtts_tpu.models.hifigan as hg
        y_pal = hg.hifigan_generator_apply(voc, mel, mrf_impl="pallas")
    finally:
        pm.pallas_mrf = orig
        pm.pallas_mrf_folded = orig_folded
    # the C=256 stage rides pallas_mrf_wide (bf16 weight storage) by
    # default, so the comparison is bf16-rounding-tolerance, not exact
    scale = np.abs(np.asarray(y_xla)).max()
    assert np.abs(np.asarray(y_pal) - np.asarray(y_xla)).max() \
        < 0.02 * scale


def test_pallas_mrf_wide_decomposition_exact(voc):
    """Per-resblock decomposition (the wide-stage C=256 strategy) with fp32
    weights must equal the fused three-resblock kernel exactly: same conv
    math, outputs summed outside, in-kernel division by the true count."""
    from radtts_tpu.ops.pallas_mrf import KERNEL_SIZES

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 500, 64)).astype(np.float32))
    w = mrf_weights_from_params(voc["resblocks"][2])
    fused = pallas_mrf(x, w, tile=256, interpret=True)
    parts = [pallas_mrf(x, (wd,), tile=256, interpret=True,
                        kernel_sizes=(KERNEL_SIZES[m],), n_out_rb=3)
             for m, wd in enumerate(w)]
    np.testing.assert_allclose(np.asarray(sum(parts)), np.asarray(fused),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("stage,T,C,F", [(3, 1000, 32, 4), (2, 700, 64, 2),
                                         (3, 512, 32, 4)])
def test_pallas_mrf_folded_matches_xla(voc, stage, T, C, F):
    """Time-folded kernel (fold F frames into lanes) == XLA resblock path,
    including sequence-end zero padding and a non-multiple-of-(tile*F)
    length."""
    from radtts_tpu.ops.pallas_mrf import pallas_mrf_folded

    rng = np.random.default_rng(stage + 10 * F)
    x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
    xs = jnp.zeros_like(x)
    for j, block in enumerate(voc["resblocks"][stage]):
        xs = xs + _resblock1_apply(block, x, RK[j], RD[j])
    ref = xs / 3
    w = mrf_weights_from_params(voc["resblocks"][stage])
    out = pallas_mrf_folded(x, w, fold=F, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_mrf_folded_ragged_tail(voc):
    """T not a multiple of fold: the kernel pads frames internally and
    returns exactly T frames equal to the unfolded reference."""
    from radtts_tpu.ops.pallas_mrf import pallas_mrf_folded

    stage, T, C, F = 3, 997, 32, 4
    rng = np.random.default_rng(99)
    x = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))
    xs = jnp.zeros_like(x)
    for j, block in enumerate(voc["resblocks"][stage]):
        xs = xs + _resblock1_apply(block, x, RK[j], RD[j])
    ref = xs / 3
    out = pallas_mrf_folded(x, mrf_weights_from_params(
        voc["resblocks"][stage]), fold=F, tile=32, interpret=True)
    assert out.shape == (1, T, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_mrf_wide_bf16_close_on_c256(voc):
    """pallas_mrf_wide at the C=256 stage (bf16 weight storage): must match
    the XLA fp32 reference to bf16-rounding tolerance — a halo or indexing
    bug would blow far past it."""
    from radtts_tpu.ops.pallas_mrf import pallas_mrf_wide

    stage, T, C = 0, 300, 256
    rng = np.random.default_rng(stage)
    x = jnp.asarray(rng.standard_normal((1, T, C)).astype(np.float32))
    xs = jnp.zeros_like(x)
    for j, block in enumerate(voc["resblocks"][stage]):
        xs = xs + _resblock1_apply(block, x, RK[j], RD[j])
    ref = np.asarray(xs / 3)
    out = np.asarray(pallas_mrf_wide(
        x, mrf_weights_from_params(voc["resblocks"][stage]),
        tile=128, interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 0.02 * scale, (
        np.abs(out - ref).max(), scale)
