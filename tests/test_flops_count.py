"""Analytic matmul/conv FLOP counter (ops/flops.py) — the honest MFU
numerator for bench_train.py: known shapes, scan scaling, grad doubling."""

import numpy as np

import jax
import jax.numpy as jnp

from radtts_tpu.ops.flops import count_matmul_flops


def test_plain_matmul():
    a = jnp.zeros((8, 32))
    b = jnp.zeros((32, 16))
    assert count_matmul_flops(lambda x, y: x @ y, a, b) == 2 * 8 * 32 * 16


def test_batched_dot():
    a = jnp.zeros((4, 8, 32))
    b = jnp.zeros((4, 32, 16))
    got = count_matmul_flops(jnp.matmul, a, b)
    assert got == 2 * 4 * 8 * 32 * 16


def test_conv():
    x = jnp.zeros((2, 24, 100))  # NCW
    w = jnp.zeros((48, 24, 5))   # OIW
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", dimension_numbers=("NCW", "OIW", "NCW"))
    # out (2, 48, 100); per output elem: 2 * C_in * K
    assert count_matmul_flops(f, x, w) == 2 * (2 * 48 * 100) * 24 * 5


def test_scan_multiplies_by_length():
    a = jnp.zeros((8, 8))
    def f(a):
        def body(c, _):
            return c @ a, ()
        c, _ = jax.lax.scan(body, a, None, length=7)
        return c
    assert count_matmul_flops(f, a) == 7 * 2 * 8 * 8 * 8


def test_grad_includes_backward():
    a = jnp.zeros((8, 32))
    w = jnp.zeros((32, 16))
    fwd = count_matmul_flops(lambda w: jnp.sum(a @ w), w)
    both = count_matmul_flops(jax.grad(lambda w: jnp.sum(a @ w)), w)
    assert fwd == 2 * 8 * 32 * 16
    # d/dw = a.T @ g: one extra matmul of the same flop count
    assert both >= 2 * fwd


def test_jit_boundary_is_traversed():
    a = jnp.zeros((8, 32))
    b = jnp.zeros((32, 16))
    assert count_matmul_flops(jax.jit(lambda x, y: x @ y), a, b) \
        == 2 * 8 * 32 * 16
