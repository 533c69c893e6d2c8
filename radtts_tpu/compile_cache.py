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


def enable_persistent_compilation_cache(default_path=None,
                                        cache_everything=False):
    """Point jax at a persistent compilation cache directory.

    default_path: directory to use when neither JAX_COMPILATION_CACHE_DIR
    nor RADTTS_JAX_CACHE is set (the CLIs default to ~/.cache/radtts_tpu;
    bench.py and __graft_entry__ pass the repo-local .jax_cache).
    cache_everything: also drop jax's >=1s-compile-time / entry-size
    persistence thresholds — used by the driver entry points, whose small
    probe programs must still hit cache on rerun.
    """
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not path:
        loc = os.environ.get("RADTTS_JAX_CACHE",
                             default_path
                             or os.path.join("~", ".cache", "radtts_tpu",
                                             "xla"))
        if loc.lower() in ("", "0", "off", "none"):
            return None
        path = os.path.expanduser(loc)
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        if cache_everything:
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              -1)
        # default thresholds otherwise: cache everything >=1s to compile
        # (jax default) — the big pipeline programs are minutes each
        # through the tunnel
    except Exception:  # cache is an optimization, never a requirement
        return None
    return path
