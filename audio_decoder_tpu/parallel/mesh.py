"""Device mesh + sharding policy.

The reference is a single-process, 4-thread program with no distributed
machinery (SURVEY §2 parallelism inventory).  The TPU build's scaling story
is SPMD over a ``jax.sharding.Mesh``:

  * ``data``  — the file/frame batch axis (decode is embarrassingly
    data-parallel; collectives only for consensus reductions), riding ICI
    within a slice and DCN across hosts;
  * ``model`` — intra-op parallelism for the wide matmul stages (polyphase
    synthesis filterbank, IMDCT banks) when a single batch shard is too
    large per chip.

Helpers here build the mesh and standard NamedShardings so every pipeline
stage annotates the same way.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Files/frames sharded over 'data'; trailing dims replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)
