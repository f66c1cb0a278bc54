"""Test env: CPU backend with 8 virtual devices (the JAX-native fake cluster).

Must run before jax initialises — pytest imports conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon; must override, not setdefault
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment force-registers the axon TPU plugin (JAX_PLATFORMS=axon via
# sitecustomize); the env var alone does not stick — set the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/unigen_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
