"""Jitted block renderer — the engine's hot loop, scan-free.

The reference renders one sample at a time, per channel, per voice,
straight into the ALSA DMA buffer (Conductor::coordinate,
engine.rs:46-81: O(frames x channels x voices) scalar ops).  Here a whole
block renders as one vectorized program:

* sequencer triggers are *computed, not stepped*: a tempo boundary lands
  on frame f iff ``(clock + f - start) % interval == 0`` — an elementwise
  test over the [V, F] grid, with counter-derived uniform randoms for the
  per-step chance roll (processes.rs:77-89's rng), so retriggers need no
  per-sample loop.  This also fixes the reference's float-equality step
  matching (SURVEY §5 defect 8).  The i32 clock/t_start arithmetic is
  two's-complement modular, so clock wraparound is harmless as long as a
  single tempo lane runs < 2^31 samples (~13.5 h at 44.1 kHz) since its
  last (re)start — restart/resume re-bases it;
* voice positions are piecewise-linear between triggers: with the last
  trigger frame per position obtained from a running maximum, every
  frame's fractional cursor is closed-form — no carried state inside the
  block;
* sample fetch is a batched gather + linear interpolation
  (engine.rs:429-438's velocity interp, applied uniformly), mono→stereo
  fan-out via channel clamping (engine.rs:419-427);
* the mix is a masked sum over voices with a final clamp to [-1, 1]
  (the reference accumulates into i16 with silent wraparound —
  SURVEY §5 defect 7 — deliberately not reproduced).

Returns the rendered block plus the advanced state; commands mutate state
between blocks (commands.py), mirroring the reference's queue-drain-then-
render loop (runtime.rs:320-380).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .state import (
    MAX_STEPS, MAX_VOICES, PROC_ENV, PROC_SEQ, PROC_TREM, EngineArrays,
)


@functools.partial(jax.jit, static_argnames=("frames", "out_channels"))
def render_block(
    st: EngineArrays, *, frames: int, out_channels: int
) -> tuple[jax.Array, EngineArrays]:
    """Render `frames` samples → (block [frames, out_channels] f32, state')."""
    F = frames
    V = MAX_VOICES
    f32 = jnp.float32
    i32 = jnp.int32
    fidx = jnp.arange(F, dtype=i32)  # [F]

    # ---- process chains on the [V, P, F] grid ----
    # Each of the MAX_PROCS slots is evaluated by kind and the results
    # combine per voice (≙ the per-sample Process-chain walk,
    # engine.rs:391-394 / processes.rs:69): any SEQ slot may retrigger,
    # every TREM slot multiplies into the gain.
    lane = jnp.maximum(st.v_tempo, 0)
    interval = jnp.maximum(st.t_interval[lane], 1)  # [V]
    t_on = st.t_active[lane] & (st.v_tempo >= 0)
    rel = (st.clock + fidx[None, :]) - st.t_start[lane][:, None]  # [V, F]
    step_num = jnp.maximum(rel, 0) // interval[:, None]  # [V, F]
    is_seq = st.p_kind == PROC_SEQ  # [V, P]
    k = step_num[:, None, :] % jnp.maximum(st.p_period, 1)[:, :, None]
    k = jnp.minimum(k, MAX_STEPS - 1)  # [V, P, F]
    # Step-table lookup as ONE one-hot matmul instead of three element
    # gathers: HBM gathers on the [V, P, F] grid cost ~12-14 ms each per
    # 4096-frame block on this chip, while the equivalent one-hot
    # dot_general over the stacked [V, P, K, 3] table rides the MXU at
    # ~1 ms for all three lookups (26x; see docs/PERFORMANCE.md).
    # Bit-exact: each one-hot row holds a single 1.0, so every output
    # element is 1.0 * table[k] summed with exact zeros.
    step_tab = jnp.stack(
        [st.p_stepmask.astype(f32), st.p_chance, st.p_jitter], axis=-1
    )  # [V, P, K, 3]
    onehot = (
        k[..., None] == jnp.arange(MAX_STEPS, dtype=i32)
    ).astype(f32)  # [V, P, F, K]
    got = jax.lax.dot_general(
        onehot, step_tab, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,  # TPU default is bf16 inputs —
        # that would round the f32 chance/jitter values and break exactness
    )  # [V, P, F, 3]
    in_step = got[..., 0] > 0.5
    chance = got[..., 1]
    # Per-step trigger jitter (the reference's -j stub, made real): the
    # step's boundary is delayed by floor(u * jitter * interval) frames,
    # u a stable hash of (tempo lane, absolute step number) — identical
    # across block boundaries and shared by group members, like the
    # chance roll.  jitter == 0 reproduces the unjittered grid exactly.
    jit_k = got[..., 2]  # [V, P, F]
    seed = jax.random.randint(
        jax.random.fold_in(st.rng_key, 7), (), 0, 2**31 - 1
    ).astype(jnp.uint32)
    h = (
        step_num.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        ^ (lane[:, None].astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
        ^ seed
    )
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    u_j = h.astype(f32) * (1.0 / 4294967296.0)  # [V, F]
    delay = jnp.floor(
        u_j[:, None, :] * jit_k * interval[:, None, None].astype(f32)
    ).astype(i32)
    # uint32→f32 rounds the top ~128 hash values to exactly 1.0, which
    # would make delay == interval and silently kill that step forever;
    # clamp so a full-jitter step still fires on the last frame
    delay = jnp.minimum(delay, interval[:, None, None] - 1)
    boundary = (rel[:, None, :] >= 0) & (
        rel[:, None, :] % interval[:, None, None] == delay
    )  # [V, P, F]
    # Chance rolls are keyed by TEMPO LANE, not voice: voices driven by one
    # group sequencer share a roll (the reference's group-level Seq rolls
    # once per trigger, processes.rs:77-89), while independent voices get
    # independent streams.
    n_lanes = st.t_interval.shape[0]
    u_lane = jax.random.uniform(
        jax.random.fold_in(st.rng_key, st.clock), (n_lanes, F), dtype=f32
    )
    u = u_lane[lane]  # [V, F]
    grp = st.v_group
    g_ok = jnp.where(grp >= 0, st.g_active[jnp.maximum(grp, 0)], True)
    sounding = st.v_used & st.v_active & g_ok
    has_seq = is_seq.any(axis=1)  # [V]
    trig = (
        sounding[:, None, None]
        & is_seq[:, :, None]
        & t_on[:, None, None]
        & boundary
        & in_step
        & (u[:, None, :] < chance)
    ).any(axis=1)  # [V, F]

    # gain-process slots (both tempo-synced, phase 0 = unity gain so
    # enabling one never clicks):
    #   TREM — raised-cosine LFO cycling over p_period tempo steps;
    #     depth 0 → unity, depth 1 → full dips;
    #   ENV  — per-cycle decay envelope ("rhythmic gate"): gain restarts
    #     at 1.0 each p_period-step cycle and decays exponentially to
    #     (1 - depth) + ~0.001·depth by cycle end.
    cycle = (
        interval[:, None, None]
        * jnp.maximum(st.p_period, 1)[:, :, None]
    ).astype(f32)  # [V, P, 1] frames per process cycle
    is_trem = (st.p_kind == PROC_TREM) & t_on[:, None]  # [V, P]
    ph = rel[:, None, :].astype(f32) / cycle
    lfo = 1.0 - st.p_depth[:, :, None] * (0.5 - 0.5 * jnp.cos(
        2.0 * jnp.pi * ph
    ))
    is_env = (st.p_kind == PROC_ENV) & t_on[:, None]  # [V, P]
    ph_cyc = jnp.mod(rel[:, None, :].astype(f32), cycle) / cycle  # [0,1)
    env = (1.0 - st.p_depth[:, :, None]) + st.p_depth[:, :, None] * jnp.exp(
        -6.9077554 * ph_cyc  # ln(1000): tail lands at 0.1% of depth
    )
    started = rel[:, None, :] >= 0
    slot_mult = jnp.where(is_trem[:, :, None] & started, lfo, 1.0)
    slot_mult = slot_mult * jnp.where(is_env[:, :, None] & started, env, 1.0)
    gain_mult = slot_mult.prod(axis=1)  # [V, F]

    # ---- closed-form positions between triggers ----
    end = (st.track_len[st.v_track] - 1).astype(f32)  # [V]
    reset = jnp.where(st.v_vel < 0, end, 0.0)  # [V]
    last_trig = jax.lax.associative_scan(
        jnp.maximum, jnp.where(trig, fidx[None, :], -1), axis=1
    )  # [V, F]
    free_pos = st.v_pos[:, None] + st.v_vel[:, None] * fidx[None, :].astype(f32)
    trig_pos = reset[:, None] + st.v_vel[:, None] * (
        fidx[None, :] - last_trig
    ).astype(f32)
    pos = jnp.where(last_trig >= 0, trig_pos, free_pos)  # [V, F]

    # ---- audibility + sample fetch (gather + linear interp) ----
    in_range = (pos >= 0.0) & (pos <= end[:, None])
    audible = sounding[:, None] & in_range  # [V, F]

    C_t = st.track_c  # static storage channel count of the flat store
    S = st.tracks.shape[1] // C_t
    base = jnp.clip(jnp.floor(pos).astype(i32), 0, S - 1)
    frac = pos - base.astype(f32)
    # ONE 8-wide row gather per (voice, frame) delivers both interp taps
    # for every channel: row k of track_rows is flat[4k:4k+8] over the
    # flat [T, S*C] store, and the window (2C consecutive samples starting
    # at the tap's flat index) always fits one stride-4 row.  ~2.7x fewer
    # gathered elements than the per-tap-per-channel element gathers for
    # stereo (row gather ~1.5 element-equivalents; docs/PERFORMANCE.md).
    # Bit-exact: at pos == end, frac == 0 zeroes the (out-of-track) s1.
    if C_t <= 2:
        flatbase = (st.v_track[:, None] * S + base) * C_t  # [V, F]
        row_k = flatbase >> 2
        o = flatbase & 3
        row = st.track_rows[row_k]  # [V, F, 8] row gather
        # in-row select: o in 0..3, window 2C <= 4 wide — static slices +
        # a 4-way select tree (elementwise; no per-element gather)
        cands = [row[..., s:s + 2 * C_t] for s in range(4)]
        taps = cands[3]
        for s_off in (2, 1, 0):
            taps = jnp.where((o == s_off)[..., None], cands[s_off], taps)
        s0 = taps[..., :C_t]  # [V, F, C]
        s1 = taps[..., C_t:]
    else:
        # > 2 channels: the 2C-wide window no longer fits an 8-word row —
        # keep the per-tap element gather (static branch: C_t is a trace
        # constant, so only one path compiles)
        nxt = jnp.minimum(base + 1, S - 1)
        flat = st.tracks.reshape(-1, C_t)  # [T*S, C] (device relayout —
        # only on this >2-channel fallback path, never for mono/stereo)
        off = (st.v_track * S)[:, None]
        s0 = flat[off + base]  # [V, F, C]
        s1 = flat[off + nxt]
    smp = s0 + (s1 - s0) * frac[..., None]  # [V, F, C]

    # channel routing: output channel c reads track channel min(c, C-1) —
    # out <= C slices, out > C repeats the last channel, and 1-channel
    # tracks fan out to every output (engine.rs:419-427), so the block
    # always honors the [frames, out_channels] contract
    smp = smp[:, :, jnp.minimum(jnp.arange(out_channels), C_t - 1)]
    mono = (st.track_ch[st.v_track] == 1)[:, None, None]
    smp = jnp.where(mono, smp[:, :, :1], smp)

    w = jnp.where(audible, st.v_gain[:, None] * gain_mult, 0.0)  # [V, F]
    block = jnp.einsum(
        "vf,vfc->fc", w, smp, precision=jax.lax.Precision.HIGHEST
    )  # TPU default would round the f32 samples to bf16 (~48 dB SNR)
    block = jnp.clip(block, -1.0, 1.0)

    # ---- advance state (paused/stopped voices hold position) ----
    pos_next = jnp.where(sounding, pos[:, F - 1] + st.v_vel, st.v_pos)
    # without a sequencer the voice parks when it runs off the track
    ran_off = (pos_next < 0.0) | (pos_next > end)
    active_next = st.v_active & (~sounding | has_seq | ~ran_off)

    # NOTE: rendering advances ONLY v_active / v_pos / clock — every
    # other field passes through untouched.  render_chain's per-block
    # state reconstruction (and the loop's speculation) depends on this
    # contract; test_engine's chain-equivalence test pins it.
    st2 = EngineArrays(
        track_c=st.track_c,
        tracks=st.tracks, track_rows=st.track_rows,
        track_len=st.track_len, track_ch=st.track_ch,
        v_used=st.v_used, v_active=active_next, v_track=st.v_track,
        v_pos=pos_next, v_vel=st.v_vel, v_gain=st.v_gain, v_group=st.v_group,
        t_interval=st.t_interval, t_start=st.t_start, t_active=st.t_active,
        v_tempo=st.v_tempo, g_tempo=st.g_tempo,
        p_kind=st.p_kind, p_period=st.p_period, p_stepmask=st.p_stepmask,
        p_chance=st.p_chance, p_jitter=st.p_jitter, p_depth=st.p_depth,
        g_used=st.g_used, g_active=st.g_active,
        clock=st.clock + F, rng_key=st.rng_key,
    )
    return block, st2


@functools.partial(
    jax.jit, static_argnames=("frames", "out_channels", "depth"))
def render_chain(
    st: EngineArrays, *, frames: int, out_channels: int, depth: int
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """``depth`` consecutive blocks in ONE device dispatch.

    The playback loop's speculative lookahead used to issue D separate
    ``render_block`` dispatches; each pays the per-dispatch wire floor
    (~1 ms over a tunnel), which capped 64-voice wall throughput at
    ~27x RT against ~52x on-device.  A ``lax.scan`` over the block body
    makes the whole burst one program: one dispatch + one fetch for D
    blocks.

    Returns ``(blocks [D, frames, out_channels], v_active [D, V],
    v_pos [D, V], clock [D])`` — the three fields are the ONLY state the
    renderer advances (see render_block's st2), so block i's full post-
    state is ``dataclasses.replace(st, v_active=..[i], v_pos=..[i],
    clock=..[i])`` with every other leaf shared, and playback output is
    bit-identical to D sequential render_block calls (pinned by test).
    """
    def step(carry, _):
        blk, nxt = render_block(
            carry, frames=frames, out_channels=out_channels)
        return nxt, (blk, nxt.v_active, nxt.v_pos, nxt.clock)

    _, ys = jax.lax.scan(step, st, None, length=depth)
    return ys


def render_seconds(st: EngineArrays, seconds: float, rate: int,
                   out_channels: int, block: int = 128):
    """Render a stretch of audio block-by-block (test/offline sink)."""
    import numpy as np

    n_blocks = int(seconds * rate) // block
    out = []
    for _ in range(n_blocks):
        blk, st = render_block(st, frames=block, out_channels=out_channels)
        out.append(np.asarray(blk))
    return np.concatenate(out), st
