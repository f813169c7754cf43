"""Engine state: voices, groups, tempo and sequencers as device arrays.

The reference's render graph is heap-objects-with-RefCells — `Conductor`
owning `Voice`/`Group` each cloning its track samples and carrying
`VoiceState{active, position, end, velocity, gain, tempo}`
(engine.rs:27-33, 279-286, 288-449) plus `Rc<RefCell<TempoState>>` shared
clocks (blast_time.rs:57-64) and per-voice `Seq` step sequencers
(processes.rs:52-99).  A TPU engine is a *pytree of arrays* instead: a
fixed-capacity structure-of-arrays that flows through one jitted block
renderer, with commands applied between blocks as functional array
updates.

Capacity is static (MAX_VOICES / MAX_STEPS) so the renderer compiles
once; inactive slots are masked.  Tracks live in one padded device tensor
so per-voice sample reads are gathers, not per-object pointers — and,
unlike the reference, voices referencing the same track share it instead
of cloning (engine.rs:309 clones the full sample Vec per voice).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

MAX_VOICES = 64
MAX_GROUPS = 16
MAX_CONTEXTS = 16
MAX_STEPS = 64  # sequencer period capacity (steps per period)
MAX_PROCS = 4  # process-chain slots per voice (≙ Vec<Process>)

#: process kinds (≙ the processes! enum dispatch, processes.rs:12-50 —
#: an extensible axis the reference designs for but only instantiates
#: once; Seq ≙ processes.rs:52-99; tremolo and the decay envelope are
#: the further kinds proving the axis)
PROC_NONE = 0
PROC_SEQ = 1
PROC_TREM = 2
PROC_ENV = 3

#: tempo owner kinds (≙ TempoMode, blast_time.rs:66-74)
TEMPO_VOICE = 0
TEMPO_GROUP = 1
TEMPO_CONTEXT = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EngineArrays:
    """Device-resident engine state (one pytree through the renderer)."""

    # tracks — FLAT interleaved [T, S*C] with a static storage channel
    # count, NOT [T, S, C]: a trailing dim of 1-2 would tile-pad every
    # 128-lane TPU tile to 1-2 used elements, a 64-128x resident-HBM tax
    # on the whole track store (same rationale as AudioBatch.data,
    # core/batch.py module docstring)
    tracks: jax.Array  # f32 [T, S*C] padded decoded PCM, flat interleaved
    track_rows: jax.Array  # f32 [R, 8] stride-4 rows over flat tracks
    #                        (derived; see build_track_rows)
    track_len: jax.Array  # i32 [T]
    track_ch: jax.Array  # i32 [T]

    # voices (SoA over MAX_VOICES; ≙ VoiceState engine.rs:279-286)
    v_used: jax.Array  # bool [V] slot allocated
    v_active: jax.Array  # bool [V] currently sounding
    v_track: jax.Array  # i32 [V]
    v_pos: jax.Array  # f32 [V] fractional sample cursor
    v_vel: jax.Array  # f32 [V] signed playback velocity
    v_gain: jax.Array  # f32 [V]
    v_group: jax.Array  # i32 [V] owning group or -1

    # tempo lanes: one per voice/group/context owner
    # (interval in samples, start clock, running flag; ≙ TempoState)
    t_interval: jax.Array  # i32 [V + G + X]
    t_start: jax.Array  # i64-ish i32 [V + G + X] clock at (re)start
    t_active: jax.Array  # bool [V + G + X]
    v_tempo: jax.Array  # i32 [V] tempo lane per voice (-1 = none)
    g_tempo: jax.Array  # i32 [G] tempo lane per group (-1 = none)

    # process chains: MAX_PROCS enum-dispatched slots per voice
    # (≙ Voice's Vec<Process> + the processes! macro, processes.rs:12-50;
    # the reference's one instance, Seq, lives in any slot with
    # p_kind == PROC_SEQ; PROC_TREM is a tempo-synced gain LFO)
    p_kind: jax.Array  # i32 [V, P] PROC_NONE/SEQ/TREM/ENV
    p_period: jax.Array  # i32 [V, P] steps per cycle (seq/trem/env)
    p_stepmask: jax.Array  # bool [V, P, MAX_STEPS] seq trigger steps
    p_chance: jax.Array  # f32 [V, P, MAX_STEPS] seq per-step probability
    p_jitter: jax.Array  # f32 [V, P, MAX_STEPS] seq trigger delay, fraction
    #                      of the tempo interval (the reference parses -j
    #                      but never applies it, commands.rs:1125-1136)
    p_depth: jax.Array  # f32 [V, P] trem/env modulation depth in [0, 1]

    # groups
    g_used: jax.Array  # bool [G]
    g_active: jax.Array  # bool [G]

    # global sample clock (≙ blast_time.rs:24-36) + RNG key
    clock: jax.Array  # i32 scalar (samples since engine start)
    rng_key: jax.Array

    # static storage channel count C of the track interleaving
    track_c: int = dataclasses.field(metadata=dict(static=True), default=1)


def build_track_rows(tracks: jax.Array) -> jax.Array:
    """Stride-4, 8-wide sample rows over the flattened track store.

    Row k = flat[4k : 4k+8].  Any two-tap interpolation window (both
    taps, every channel, C <= 2) fits inside ONE row regardless of the
    fractional position's alignment, so the renderer fetches a single
    row per (voice, frame) instead of 2C element gathers — a TPU row
    gather costs ~1.5 element-gathers but delivers 8 words
    (docs/PERFORMANCE.md gather facts; same trick as the Huffman scan's
    bit windows).  Built once per track load, ~2x track memory."""
    flat = tracks.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % 4 + 8
    flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    a = flat.reshape(-1, 4)
    return jnp.concatenate([a[:-1], a[1:]], axis=1)


def empty_state(
    tracks: jax.Array, track_len, track_ch, out_channels: int,
    *, channels: int | None = None,
) -> EngineArrays:
    """Build a fresh engine state.

    ``tracks`` is planar ``[T, S, C]`` (flattened here; free in C order)
    or already-flat ``[T, S*C]`` with ``channels`` giving C."""
    V, G, X = MAX_VOICES, MAX_GROUPS, MAX_CONTEXTS
    lanes = V + G + X
    tracks = jnp.asarray(tracks, jnp.float32)
    if tracks.ndim == 3:
        T, _S, C = tracks.shape
        tracks = tracks.reshape(T, -1)
    else:
        if channels is None:
            raise ValueError("flat tracks need an explicit channels=")
        C = int(channels)
    return EngineArrays(
        track_c=C,
        tracks=tracks,
        track_rows=build_track_rows(tracks),
        track_len=jnp.asarray(track_len, jnp.int32),
        track_ch=jnp.asarray(track_ch, jnp.int32),
        v_used=jnp.zeros(V, bool),
        v_active=jnp.zeros(V, bool),
        v_track=jnp.zeros(V, jnp.int32),
        v_pos=jnp.zeros(V, jnp.float32),
        v_vel=jnp.ones(V, jnp.float32),
        v_gain=jnp.ones(V, jnp.float32),
        v_group=jnp.full((V,), -1, jnp.int32),
        t_interval=jnp.ones(lanes, jnp.int32),
        t_start=jnp.zeros(lanes, jnp.int32),
        t_active=jnp.zeros(lanes, bool),
        v_tempo=jnp.full((V,), -1, jnp.int32),
        g_tempo=jnp.full((G,), -1, jnp.int32),
        p_kind=jnp.zeros((V, MAX_PROCS), jnp.int32),
        p_period=jnp.ones((V, MAX_PROCS), jnp.int32),
        p_stepmask=jnp.zeros((V, MAX_PROCS, MAX_STEPS), bool),
        p_chance=jnp.zeros((V, MAX_PROCS, MAX_STEPS), jnp.float32),
        p_jitter=jnp.zeros((V, MAX_PROCS, MAX_STEPS), jnp.float32),
        p_depth=jnp.zeros((V, MAX_PROCS), jnp.float32),
        g_used=jnp.zeros(G, bool),
        g_active=jnp.zeros(G, bool),
        clock=jnp.zeros((), jnp.int32),
        rng_key=jax.random.PRNGKey(0xB1A57),
    )


def tracks_from_batch(batch, consensus_channels: int):
    """AudioBatch → (flat tracks [T, S*C], lens, chs) device tensors,
    C = consensus_channels.  When the batch is already interleaved at
    the consensus width the data passes through with NO device relayout;
    otherwise one load-time reshape/pad/slice rewidths it."""
    if batch.channels == consensus_channels:
        return batch.data, batch.valid_frames, batch.num_channels
    pcm = batch.pcm
    if pcm.shape[2] < consensus_channels:
        pcm = jnp.pad(
            pcm, ((0, 0), (0, 0), (0, consensus_channels - pcm.shape[2]))
        )
    pcm = pcm[:, :, :consensus_channels]
    return (pcm.reshape(pcm.shape[0], -1), batch.valid_frames,
            batch.num_channels)


class HostRegistry:
    """Host-side name → slot mirror (≙ EngineState, commands.rs:287-310).

    All naming, lookup and validation happens here so the jitted renderer
    only ever sees integer slots — the same split the reference enforces
    between its REPL thread and audio thread."""

    def __init__(self, track_names: list[str]):
        self.tracks = {n: i for i, n in enumerate(track_names)}
        self.voices: dict[str, int] = {}
        self.groups: dict[str, int] = {}
        self.contexts: dict[str, int] = {}
        self.group_members: dict[str, list[str]] = {}
        self._free_v = list(range(MAX_VOICES))
        self._free_g = list(range(MAX_GROUPS))
        self._free_x = list(range(MAX_CONTEXTS))

    def alloc_voice(self, name: str) -> int:
        if name in self.voices:
            raise KeyError(f"voice exists: {name}")
        if not self._free_v:
            raise RuntimeError("voice capacity exhausted")
        slot = self._free_v.pop(0)
        self.voices[name] = slot
        return slot

    def free_voice(self, name: str) -> int:
        slot = self.voices.pop(name)
        self._free_v.append(slot)
        return slot

    def alloc_group(self, name: str) -> int:
        if name in self.groups:
            raise KeyError(f"group exists: {name}")
        if not self._free_g:
            raise RuntimeError("group capacity exhausted")
        slot = self._free_g.pop(0)
        self.groups[name] = slot
        self.group_members[name] = []
        return slot

    def alloc_context(self, name: str) -> int:
        if name in self.contexts:
            raise KeyError(f"tempo context exists: {name}")
        if not self._free_x:
            raise RuntimeError("context capacity exhausted")
        slot = self._free_x.pop(0)
        self.contexts[name] = slot
        return slot

    # tempo lane index layout: [voices | groups | contexts]
    @staticmethod
    def voice_lane(v: int) -> int:
        return v

    @staticmethod
    def group_lane(g: int) -> int:
        return MAX_VOICES + g

    @staticmethod
    def context_lane(x: int) -> int:
        return MAX_VOICES + MAX_GROUPS + x
