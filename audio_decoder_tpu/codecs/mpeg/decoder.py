"""End-to-end batched MPEG Layer III decode orchestration.

Completes the reference's decode TODO (blast/src/main.rs:44-54).  Stage
modules land incrementally; until the full chain is wired, MP3 assets decode
to per-file ``ERR_UNSUPPORTED`` so the mixed-batch pipeline stays total.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax.numpy as jnp

from ...core import errors as E
from ...core.batch import AudioBatch

if TYPE_CHECKING:  # pragma: no cover
    from ...io.assets import Asset


def decode_group(assets: "list[Asset]") -> list[tuple[list[int], AudioBatch]]:
    """Decode a group of MP3 assets → (local_indices, AudioBatch) pieces."""
    n = len(assets)
    batch = AudioBatch(
        pcm=jnp.zeros((n, 1, 1), jnp.float32),
        sample_rate=jnp.zeros((n,), jnp.int32),
        num_channels=jnp.zeros((n,), jnp.int32),
        bits_per_sample=jnp.zeros((n,), jnp.int32),
        valid_frames=jnp.zeros((n,), jnp.int32),
        err=jnp.full((n,), E.ERR_UNSUPPORTED, jnp.int32),
        names=tuple(a.name for a in assets),
        formats=("mp3",) * n,
    )
    return [(list(range(n)), batch)]
