"""Sequence masking utilities.

The reference builds boolean masks from lengths with a hardcoded CUDA tensor
(reference: common.py:86-97). Here masks are pure functions of (lengths,
static max_len) so everything stays jittable with static shapes.
"""

import jax.numpy as jnp


def sequence_mask(lengths, max_len):
    """lengths (B,) int -> bool mask (B, max_len), True where t < length."""
    t = jnp.arange(max_len, dtype=lengths.dtype)
    return t[None, :] < lengths[:, None]
