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


def _map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: the guard is a no-op
        return 0


@pytest.fixture(autouse=True)
def _bound_jit_code_maps():
    """Keep the process under vm.max_map_count (65530 default).

    Every live XLA:CPU executable holds r-xp/r--p/rw-p anonymous map
    TRIPLES for its JIT code — a full-suite process accumulates tens of
    thousands (measured 41k+ two-thirds in) and then mmap fails inside
    the next executable deserialization, which segfaults the
    interpreter (observed repeatedly at tests/test_mp3_tpu.py on a
    65530-limit host; single files pass because fresh processes start
    near zero).  Dropping JAX's compiled-program caches releases the
    mappings (measured 1213 → 502 across 60 jits); later tests re-load
    from the persistent disk cache, so the cost is deserialization, not
    recompilation."""
    yield
    if _map_count() > 35_000:
        jax.clear_caches()
