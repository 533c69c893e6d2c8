"""Optional debug-mode numerical sentinels.

The reference surfaces flow blow-ups early: it raises on NaN spline bin
indices and prints out-of-range warnings (reference: splines.py:81-82,
188-189; common.py:634-635). The branch-free jitted JAX splines clamp
silently, so training instabilities would otherwise only show up as a
diverging loss. Enabling debug mode threads runtime finite-checks into the
traced graphs via jax.debug.callback; when disabled (the default) the
checks are skipped at TRACE time, so the jitted fast path carries zero
overhead.

Usage:
    from radtts_tpu import debug
    debug.enable_numerical_checks()     # before the first jit trace
    ...
    debug.enable_numerical_checks(False)

Note the flag is read while tracing: flip it before building/jitting the
step functions (re-jit after changing it — already-compiled executables
keep whatever mode they were traced with).
"""

import jax
import jax.numpy as jnp

_ENABLED = False


def enable_numerical_checks(flag=True):
    global _ENABLED
    flag = bool(flag)
    if flag != _ENABLED:
        # jaxpr/trace caches are shared across jit wrappers of the same
        # function object; stale traces would keep the old mode baked in
        jax.clear_caches()
    _ENABLED = flag


def numerical_checks_enabled():
    return _ENABLED


class NumericalError(FloatingPointError):
    pass


def _raise_if_bad(ok, name):
    if not bool(ok):
        # On asynchronously-dispatching backends (TPU) an exception thrown
        # inside a debug callback may surface as a deferred XlaRuntimeError
        # at the next host sync instead of this NumericalError, so emit the
        # diagnostic on stderr unconditionally first — it names the
        # offending op either way. Reproduce under JAX_PLATFORMS=cpu for a
        # synchronous NumericalError at the op.
        import sys
        msg = (f"non-finite values detected in {name} (debug-mode "
               f"numerical sentinel; reference parity: splines.py:81-82)")
        print(f"FATAL radtts_tpu.debug: {msg}", file=sys.stderr, flush=True)
        raise NumericalError(msg)


def check_finite(x, name):
    """Identity op that, in debug mode, raises NumericalError at runtime if
    x contains NaN/Inf. Free when debug mode is off."""
    if _ENABLED:
        jax.debug.callback(_raise_if_bad, jnp.all(jnp.isfinite(x)), name)
    return x
