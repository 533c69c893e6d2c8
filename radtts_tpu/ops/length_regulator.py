"""Duration-based length regulation (FastSpeech-style token repetition).

The reference expands tokens with nested Python loops per sample (reference:
common.py:171-200). Here each output frame gathers its source token via a
vectorized bin lookup on the duration cumsum — one gather, no loops, static
output length.
"""

import jax.numpy as jnp


def regulate_length(x, dur, max_frames):
    """x: (B, N, C) token features; dur: (B, N) integer frame counts.
    Returns (B, max_frames, C); frames past sum(dur) are zero."""
    ends = jnp.cumsum(dur, axis=1)                       # (B, N)
    t = jnp.arange(max_frames, dtype=ends.dtype)         # (T,)
    # frame t maps to the first token whose cumsum exceeds t
    idx = jnp.sum(ends[:, None, :] <= t[None, :, None], axis=-1)  # (B, T)
    idx = jnp.clip(idx, 0, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    total = ends[:, -1:]
    valid = (t[None, :] < total).astype(x.dtype)
    return out * valid[:, :, None]
