"""Monotonic alignment search (Viterbi, width 1) on device.

The reference runs a numba CPU kernel per batch item with a GPU->CPU->GPU
round trip (reference: alignment.py:31-59, radtts.py:320-334). Here the DP is
a `lax.scan` over mel frames carrying a T_text-wide score row, and the
backtrack is a reverse scan over the stored argmax choices — fully jittable,
batched with vmap, padding-aware via (out_len, in_len).

Matches the reference's tie-break (prefer j-1 when scores tie) and its quirk
of additionally setting opt[0, 0] = 1.
"""

import jax
import jax.numpy as jnp
from jax import lax

_NEG_INF = -1e30


def _mas_single(attn, out_len, in_len):
    """attn: (T_mel, T_text) probabilities (padded). Returns hard (T_mel,
    T_text) float32 with a width-1 monotone path through the valid region."""
    T_mel, T_text = attn.shape
    cols = jnp.arange(T_text)
    rows = jnp.arange(T_mel)

    col_valid = cols < in_len
    log_attn = jnp.where(col_valid[None, :], jnp.log(attn), _NEG_INF)
    # first mel frame must align to the first token
    first_row = jnp.where(cols == 0, log_attn[0], _NEG_INF)

    def dp_step(prev, inp):
        la_row, row_valid = inp
        shifted = jnp.concatenate(
            [jnp.full((1,), _NEG_INF, prev.dtype), prev[:-1]])
        choose_left = shifted >= prev
        best = jnp.maximum(shifted, prev)
        new_prev = jnp.where(row_valid, la_row + best, prev)
        choice = jnp.where(row_valid, choose_left, False)
        return new_prev, choice

    row_valid = rows[1:] < out_len
    _, choices = lax.scan(dp_step, first_row, (log_attn[1:], row_valid),
                          unroll=8)
    # choices[i-1] holds the argmax decision entering row i (i = 1..T_mel-1)
    choices = jnp.concatenate(
        [jnp.zeros((1, T_text), bool), choices], axis=0)

    def bt_step(curr, inp):
        choice_row, row_idx = inp
        set_row = jnp.where(row_idx < out_len,
                            (cols == curr).astype(jnp.float32),
                            jnp.zeros(T_text, jnp.float32))
        go_left = jnp.take(choice_row, curr)
        new_curr = jnp.where(row_idx < out_len,
                             jnp.where(go_left, curr - 1, curr), curr)
        return new_curr, set_row

    start = in_len - 1
    _, opt_rows = lax.scan(bt_step, start, (choices, rows), reverse=True,
                           unroll=8)
    opt = opt_rows
    # reference quirk: after backtracking, opt[0, prev_ind[0, curr]] ==
    # opt[0, 0] is set unconditionally (alignment.py:58)
    opt = opt.at[0, 0].set(1.0)
    valid = (rows[:, None] < out_len) & col_valid[None, :]
    return opt * valid.astype(jnp.float32)


def mas_width1(attn, out_lens, in_lens):
    """Batched MAS. attn: (B, T_mel, T_text) soft attention probabilities;
    returns hard attention (B, T_mel, T_text) float32."""
    return jax.vmap(_mas_single)(attn, out_lens, in_lens)


if __name__ == "__main__":
    # alignment debug CLI (reference: alignment.py:61-66): load a saved
    # soft-attention .npy, plot it and its MAS binarization side by side.
    #   python -m radtts_tpu.ops.mas attn.npy
    import sys

    import numpy as np

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    attn = np.load(sys.argv[1]).squeeze()  # (T_mel, T_text)
    out_len = jnp.asarray([attn.shape[0]])
    in_len = jnp.asarray([attn.shape[1]])
    binarized = np.asarray(
        mas_width1(jnp.asarray(attn)[None], out_len, in_len))[0]

    for name, data in (("orig.png", attn), ("binarized.png", binarized)):
        plt.figure(figsize=(8, 6))
        plt.imshow(data.T, aspect="auto", origin="lower",
                   interpolation="none")
        plt.xlabel("mel frames")
        plt.ylabel("text tokens")
        plt.tight_layout()
        plt.savefig(name)
        plt.close()
        print(f"wrote {name}")
