"""Persistent XLA compilation cache for the CLI entry points.

First compiles through a remote/tunneled TPU backend cost minutes; the
reference (eager torch) pays nothing equivalent, so cold-start parity
demands reruns skip compilation entirely. Every CLI calls
enable_persistent_compilation_cache() right after importing jax; tests
and bench.py manage their own cache directories.

Opt out with RADTTS_JAX_CACHE=0|off|'' ; override the location with
RADTTS_JAX_CACHE=/path.
"""

import os


def enable_persistent_compilation_cache():
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # jax already picks this up natively; the test suite uses it to
        # share one cache with CLI subprocesses — don't override
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    loc = os.environ.get("RADTTS_JAX_CACHE",
                         os.path.join("~", ".cache", "radtts_tpu", "xla"))
    if loc.lower() in ("", "0", "off", "none"):
        return None
    path = os.path.expanduser(loc)
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes >=1s to compile (jax default);
        # the big pipeline programs are minutes each through the tunnel
    except Exception:  # cache is an optimization, never a requirement
        return None
    return path
