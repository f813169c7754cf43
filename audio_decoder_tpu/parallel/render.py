"""Voice-sharded (model-parallel) engine rendering.

The reference renders voices sequentially on one CPU core
(Conductor::coordinate, engine.rs:46-81).  The jitted block renderer is
already vectorized over the [MAX_VOICES, frames] grid; here the VOICE
axis shards over the mesh's 'model' dimension, so every chip mixes its
voice slice and XLA inserts one psum for the final mix — the engine's
equivalent of tensor parallelism.  Tempo lanes, tracks and scalars stay
replicated (they are small and gathered per voice).

Scaling shape: frames per block scale by streaming (SURVEY §5
long-context note), polyphony scales across 'model', independent engine
instances would scale across 'data'.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.render import render_block
from ..engine.state import EngineArrays

#: EngineArrays fields whose leading axis is the voice axis
_VOICE_FIELDS = (
    "v_used", "v_active", "v_track", "v_pos", "v_vel", "v_gain", "v_group",
    "v_tempo", "p_kind", "p_period", "p_stepmask", "p_chance", "p_jitter",
    "p_depth",
)


def state_shardings(mesh: Mesh, st: EngineArrays) -> EngineArrays:
    """A pytree of NamedShardings matching ``st``: per-voice arrays split
    over 'model', everything else replicated.  Built with tree_map so
    static aux fields (track_c) ride along and the spec's treedef equals
    the state's."""
    rep = NamedSharding(mesh, P())
    voice = NamedSharding(mesh, P("model"))
    return jax.tree_util.tree_map_with_path(
        lambda path, _: voice if path[0].name in _VOICE_FIELDS else rep, st
    )


def sharded_render_fn(mesh: Mesh, *, frames: int, out_channels: int):
    """Bind render_block to a mesh: voice-dim state sharded over 'model',
    the mixed block replicated (the psum over voice shards is the only
    collective).  Shardings are constrained inside the jitted step (from
    the state's own structure), so the caller just passes a state placed
    by shard_engine_state."""
    rep = NamedSharding(mesh, P())

    def step(st: EngineArrays):
        st = jax.lax.with_sharding_constraint(st, state_shardings(mesh, st))
        block, st2 = render_block(
            st, frames=frames, out_channels=out_channels)
        return (
            jax.lax.with_sharding_constraint(block, rep),
            jax.lax.with_sharding_constraint(st2, state_shardings(mesh, st2)),
        )

    return jax.jit(step)


def shard_engine_state(st: EngineArrays, mesh: Mesh) -> EngineArrays:
    """Place an engine state on the mesh per state_shardings."""
    return jax.device_put(st, state_shardings(mesh, st))
