"""Consensus output configuration as device reductions.

The reference scans its loaded tracks and picks the most frequent sample
rate (blast/src/main.rs:91-105) and the maximum channel count
(main.rs:107-120), with 44100 Hz / 2 ch fallbacks.  Here both are O(B²)/O(B)
vectorized reductions over the batch metadata — no host loop, jit-safe, and
invalid (errored) files are masked out.

Tie-break: the reference iterates a HashMap (unspecified order); we pick the
first-seen rate among the most frequent, which is deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.batch import AudioBatch


@jax.jit
def consensus_config(
    sample_rate: jax.Array,  # i32 [B]
    num_channels: jax.Array,  # i32 [B]
    err: jax.Array,           # i32 [B]
) -> tuple[jax.Array, jax.Array]:
    """Return (consensus_rate, consensus_channels) as i32 scalars."""
    if sample_rate.shape[0] == 0:  # empty batch → reference fallbacks
        return jnp.int32(44100), jnp.int32(2)
    valid = err == 0
    pair_valid = jnp.logical_and(valid[:, None], valid[None, :])
    same = sample_rate[:, None] == sample_rate[None, :]
    counts = jnp.sum(jnp.logical_and(same, pair_valid), axis=1)
    counts = jnp.where(valid, counts, -1)
    any_valid = jnp.any(valid)
    winner = jnp.argmax(counts)  # first occurrence among maxima
    rate = jnp.where(any_valid, sample_rate[winner], 44100).astype(jnp.int32)
    ch = jnp.max(jnp.where(valid, num_channels, 0))
    ch = jnp.where(any_valid, ch, 2).astype(jnp.int32)
    return rate, ch


def consensus_for(batch: AudioBatch) -> tuple[int, int]:
    """Host convenience: consensus (rate, channels) for a decoded batch."""
    r, c = consensus_config(batch.sample_rate, batch.num_channels, batch.err)
    return int(r), int(c)
