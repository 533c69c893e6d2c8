"""FFTransformer parity (DAP use_transformer backbone) and RAdam parity vs
the reference optimizer implementation."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.ref_utils import install_reference

install_reference()

from radam import RAdam as RefRAdam  # noqa: E402
from transformer import FFTransformer as RefFFT  # noqa: E402

from radtts_tpu.convert import fft_from_torch  # noqa: E402
from radtts_tpu.models.fftransformer import fft_apply, fft_init  # noqa
from radtts_tpu.train.optim import radam  # noqa: E402


def test_fftransformer_parity():
    torch.manual_seed(0)
    B, T, C = 2, 13, 32
    ref = RefFFT(in_dim=C, out_dim=1, n_layers=2, n_head=2, d_head=8,
                 d_inner=64, kernel_size=3, dropout=0.1, dropatt=0.1).eval()
    x = torch.randn(B, C, T)
    lens = torch.tensor([13, 8])
    with torch.no_grad():
        y_ref = ref(x, lens)

    tmpl = fft_init(jax.random.PRNGKey(0), in_dim=C, out_dim=1, n_layers=2,
                    n_head=2, d_head=8, d_inner=64, kernel_size=3)
    params = fft_from_torch(ref.state_dict(), "", tmpl)
    y = fft_apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                  jnp.asarray(lens.numpy()))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1),
                               y_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_radam_parity():
    torch.manual_seed(1)
    w_t = torch.nn.Parameter(torch.randn(5, 3))
    opt = RefRAdam([w_t], lr=1e-3, weight_decay=1e-2)

    # .copy(): jnp.asarray zero-copies CPU numpy buffers, and torch's
    # in-place opt.step() would mutate the aliased memory under JAX
    w_j = jnp.asarray(w_t.detach().numpy().copy())
    opt_j = radam(1e-3, weight_decay=1e-2)
    state = opt_j.init(w_j)

    for step in range(8):
        torch.manual_seed(100 + step)
        g = torch.randn(5, 3)
        w_t.grad = g.clone()
        opt.step()

        updates, state = opt_j.update(jnp.asarray(g.numpy()), state, w_j)
        w_j = w_j + updates

        np.testing.assert_allclose(np.asarray(w_j),
                                   w_t.detach().numpy(), rtol=1e-5,
                                   atol=1e-6, err_msg=f"step {step}")


def test_reim_roundtrip_odd_nfft():
    """istft_reim(stft_reim(x)) must reconstruct x for ODD n_fft too: the
    iDFT basis only has an unpaired Nyquist bin (weight 1) for even N."""
    import jax.numpy as jnp
    from radtts_tpu.ops.stft import istft_reim, stft_reim

    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((1, 3000)) * 0.1)
                        .astype(np.float32))
    for n_fft, hop in ((255, 64), (256, 64)):
        re, im = stft_reim(audio, n_fft, hop, n_fft)
        rec = istft_reim(re, im, n_fft, hop, n_fft)
        a = np.asarray(audio)[0, n_fft: 3000 - n_fft]
        r = np.asarray(rec)[0, n_fft: 3000 - n_fft]
        np.testing.assert_allclose(r, a, rtol=1e-4, atol=1e-5)


def test_radam_bf16_state():
    """optim_state_dtype="bfloat16" keeps mu/nu in bf16 in HBM but must
    track the fp32-state trajectory closely (update math runs in the grad
    dtype) and survive an npz checkpoint round trip."""
    from radtts_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from radtts_tpu.train.optim import build_optimizer

    rng = np.random.default_rng(3)
    w32 = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    w16 = w32
    opt32 = build_optimizer("RAdam", 1e-3, 1e-2, 1.0)
    opt16 = build_optimizer("RAdam", 1e-3, 1e-2, 1.0,
                            state_dtype="bfloat16")
    s32, s16 = opt32.init(w32), opt16.init(w16)

    # optax.chain wraps states in a tuple: (clip_state, moment_state)
    flat16 = jax.tree_util.tree_leaves(s16)
    assert all(x.dtype == jnp.bfloat16 for x in flat16
               if x.ndim > 0), "moments must be bf16"

    for step in range(6):
        g = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
        u32, s32 = opt32.update(g, s32, w32)
        u16, s16 = opt16.update(g, s16, w16)
        assert u16.dtype == jnp.float32  # updates stay in grad dtype
        w32 = w32 + u32
        w16 = w16 + u16
    # bf16 has ~3 decimal digits; trajectories must agree to that level
    np.testing.assert_allclose(np.asarray(w16), np.asarray(w32),
                               rtol=0, atol=2e-2)
    diff = float(jnp.max(jnp.abs(w16 - w32)))
    assert diff > 0  # sanity: the low-precision state actually differs

    # checkpoint round trip preserves the bf16 state exactly
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ck"
        save_checkpoint(path, {"w": w16}, opt_state=s16, iteration=3)
        params2, s16b, meta = load_checkpoint(
            path, {"w": jnp.zeros_like(w16)}, opt_state_template=s16)
        for a, b in zip(jax.tree_util.tree_leaves(s16),
                        jax.tree_util.tree_leaves(s16b)):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a.astype(jnp.float32)),
                                          np.asarray(b.astype(jnp.float32)))
