"""Time-folded conv exactness: folding F frames into channels
(ops/folded_conv.py) must reproduce the plain conv / the plain-XLA MRF
stages to float rounding — the folded weights add only exact-zero blocks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("k,d,C,F", [
    (3, 1, 32, 4), (3, 5, 32, 4), (7, 3, 32, 4), (11, 5, 32, 4),
    (3, 1, 64, 2), (11, 5, 64, 2), (7, 1, 16, 8), (5, 2, 32, 3),
])
def test_folded_conv_matches_plain(k, d, C, F):
    from radtts_tpu.ops.conv import conv1d_apply
    from radtts_tpu.ops.folded_conv import (fold_conv_weights,
                                            fold_time, folded_conv_apply,
                                            unfold_time)

    pad = (k * d - d) // 2
    r = np.random.default_rng(k * 100 + d * 10 + F)
    T = 24 * F
    x = jnp.asarray(r.standard_normal((2, T, C)).astype(np.float32))
    w = jnp.asarray((r.standard_normal((k, C, C)) * 0.3).astype(np.float32))
    b = jnp.asarray(r.standard_normal((C,)).astype(np.float32))

    ref = conv1d_apply({"w": w, "b": b}, x, padding=pad, dilation=d)
    fw, fb, fpad = fold_conv_weights(w, b, pad, d, F)
    got = unfold_time(folded_conv_apply(fw, fb, fpad, fold_time(x, F)), F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_generator_fold_matches_xla():
    from radtts_tpu.models.hifigan import (hifigan_generator_apply,
                                           hifigan_generator_init)

    H = {"resblock": "1",
         "upsample_rates": [8, 8, 2, 2],
         "upsample_kernel_sizes": [16, 16, 4, 4],
         "upsample_initial_channel": 128,  # stages C=64,32,16,8: all fold
         "resblock_kernel_sizes": [3, 7, 11],
         "resblock_dilation_sizes": [[1, 3, 5]] * 3}
    voc = hifigan_generator_init(jax.random.PRNGKey(0), H)
    r = np.random.default_rng(1)
    mel = jnp.asarray(r.standard_normal((2, 32, 80)).astype(np.float32))

    a = jax.jit(lambda v, m: hifigan_generator_apply(v, m,
                                                     mrf_impl="xla"))(voc,
                                                                      mel)
    f = jax.jit(lambda v, m: hifigan_generator_apply(v, m,
                                                     mrf_impl="fold"))(voc,
                                                                       mel)
    assert a.shape == f.shape
    np.testing.assert_allclose(np.asarray(f), np.asarray(a),
                               rtol=1e-4, atol=1e-5)


def test_fold_path_is_differentiable():
    """mrf_impl='fold' is plain XLA convs, so the vocoder fine-tune step
    can route generator grads through it (unlike the Pallas kernel, which
    has no transpose rule)."""
    from radtts_tpu.models.hifigan import (hifigan_generator_apply,
                                           hifigan_generator_init)

    H = {"resblock": "1",
         "upsample_rates": [8, 8, 2, 2],
         "upsample_kernel_sizes": [16, 16, 4, 4],
         "upsample_initial_channel": 128,
         "resblock_kernel_sizes": [3, 7, 11],
         "resblock_dilation_sizes": [[1, 3, 5]] * 3}
    voc = hifigan_generator_init(jax.random.PRNGKey(0), H)
    mel = jnp.asarray(np.random.default_rng(2)
                      .standard_normal((1, 32, 80)).astype(np.float32))

    def loss(v):
        return jnp.mean(hifigan_generator_apply(v, mel,
                                                mrf_impl="fold") ** 2)

    grads = jax.grad(loss)(voc)
    leaves = [g for g in jax.tree.leaves(grads)
              if hasattr(g, "dtype") and jnp.issubdtype(g.dtype,
                                                        jnp.floating)]
    assert leaves and all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


@pytest.mark.parametrize("stride,K,C_in,C_out", [(8, 16, 256, 128),
                                                 (2, 4, 64, 32),
                                                 (8, 16, 512, 256)])
def test_transpose_conv_matmul_matches_dilated(stride, K, C_in, C_out):
    """Phase-folded window-matmul transpose conv == the lhs-dilated
    formulation (reference torch ConvTranspose1d semantics), bias and
    edge padding included."""
    from radtts_tpu.models.hifigan import conv_transpose1d_apply
    from radtts_tpu.ops.folded_conv import conv_transpose1d_matmul

    r = np.random.default_rng(stride + K)
    params = {
        "w": jnp.asarray(r.standard_normal((K, C_in, C_out))
                         .astype(np.float32) * 0.05),
        "b": jnp.asarray(r.standard_normal((C_out,)).astype(np.float32)),
    }
    x = jnp.asarray(r.standard_normal((2, 37, C_in)).astype(np.float32))
    pad = (K - stride) // 2
    ref = conv_transpose1d_apply(params, x, stride, pad)
    out = conv_transpose1d_matmul(params, x, stride, pad)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_post_conv_fold_matches_plain(monkeypatch):
    """The folded conv_post (128//C frames into lanes, round-5 default:
    C_out=1 fills one MXU column otherwise) must reproduce the plain
    k=7 post conv exactly up to reduction order."""
    from radtts_tpu.models.hifigan import (hifigan_generator_apply,
                                           hifigan_generator_init)

    H = {"resblock": "1",
         "upsample_rates": [8, 8, 2, 2],
         "upsample_kernel_sizes": [16, 16, 4, 4],
         "upsample_initial_channel": 256,  # final stage C=32
         "resblock_kernel_sizes": [3, 7, 11],
         "resblock_dilation_sizes": [[1, 3, 5]] * 3}
    voc = hifigan_generator_init(jax.random.PRNGKey(3), H)
    r = np.random.default_rng(5)
    mel = jnp.asarray(r.standard_normal((2, 32, 80)).astype(np.float32))

    from radtts_tpu.ops.flops import mxu_records

    def out_channels(flag):
        monkeypatch.setenv("RADTTS_POST_FOLD", flag)
        return [r["n"] for r in mxu_records(
            lambda v, m: hifigan_generator_apply(v, m, mrf_impl="xla"),
            voc, mel) if r["kind"] == "conv"]

    # the flag must actually switch the traced graph: plain has the
    # C_out=1 post conv, folded replaces it with a 128-lane conv
    assert 1 in out_channels("0")
    assert 1 not in out_channels("1")

    monkeypatch.setenv("RADTTS_POST_FOLD", "0")
    plain = jax.jit(lambda v, m: hifigan_generator_apply(
        v, m, mrf_impl="xla"))(voc, mel)
    monkeypatch.setenv("RADTTS_POST_FOLD", "1")
    folded = jax.jit(lambda v, m: hifigan_generator_apply(
        v, m, mrf_impl="xla"))(voc, mel)
    assert plain.shape == folded.shape
    np.testing.assert_allclose(np.asarray(folded), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)
