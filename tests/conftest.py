import os

# Force CPU with 8 virtual devices so multi-chip sharding tests run anywhere.
# Must happen before any test module imports jax. Note: the axon TPU plugin
# ignores the JAX_PLATFORMS env var, so we also set the config flag.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# XLA compiles dominate suite wall-clock (the host has one CPU core, and
# each small-model jit costs ~1-4 min); persist compiled executables so
# repeated runs skip them entirely.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# ...and export the same cache to SUBPROCESS children (CLI drives,
# multi-host tests): jax reads these config options from the environment,
# so the children's compiles land in the shared cache too.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
