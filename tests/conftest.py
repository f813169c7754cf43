"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the reference has no distributed machinery
at all — SURVEY §2; this is the TPU build's fake-backend strategy, SURVEY §4e).
Environment must be set before the first jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# Force the CPU backend even when a TPU plugin (axon) is registered by a
# sitecustomize: tests must run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated test runs skip XLA recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/adt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0xB1A57)
