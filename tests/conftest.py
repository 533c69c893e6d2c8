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
