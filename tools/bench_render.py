#!/usr/bin/env python
"""Renderer throughput: all 64 voices active, stereo tracks, 4096-frame
blocks — the engine hot path (docs/PERFORMANCE.md "Engine renderer").

Timing is fetch-forced (block_until_ready does not force execution over
the axon tunnel).  Prints blocks/s, x-realtime, and voice-seconds/s.

Usage: python tools/bench_render.py [--frames 4096] [--voices 64]
       [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4096)
    ap.add_argument("--voices", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--rate", type=int, default=44100)
    ap.add_argument("--platform", default="")
    ap.add_argument("--mono", action="store_true")
    ap.add_argument("--chain", type=int, default=0,
                    help="blocks per dispatch via render_chain (the "
                         "playback loop's burst refill); 0 = one "
                         "render_block dispatch+fetch per block")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from audio_decoder_tpu.engine import commands as EC
    from audio_decoder_tpu.engine import state as ES
    from audio_decoder_tpu.engine.render import render_block, render_chain

    rng = np.random.default_rng(11)
    rate = args.rate
    S = int(args.seconds * rate)
    C = 1 if args.mono else 2
    T = 8
    tracks = (rng.standard_normal((T, S, C)) * 0.1).astype(np.float32)
    st = ES.empty_state(tracks, [S] * T, [C] * T, out_channels=2)
    reg = ES.HostRegistry([f"t{i}" for i in range(T)])
    proc = EC.CmdProcessor(reg, rate)
    for v in range(args.voices):
        name = f"t{v % T}" if v < T else f"v{v}"
        if v < T:
            st = EC.apply(st, reg, proc.parse(f"load t{v}" if v < T else ""))
        else:
            # extra voices share tracks round-robin
            import dataclasses

            st = dataclasses.replace(
                st,
                v_used=st.v_used.at[v].set(True),
                v_track=st.v_track.at[v].set(v % T),
                v_vel=st.v_vel.at[v].set(
                    float(rng.uniform(0.25, 2.0)) * (1 if v % 3 else -1)),
                v_gain=st.v_gain.at[v].set(1.0 / args.voices),
            )
    import dataclasses

    st = dataclasses.replace(
        st,
        v_used=st.v_used.at[: args.voices].set(True),
        v_active=st.v_active.at[: args.voices].set(True),
        v_pos=st.v_pos.at[:].set(
            np.asarray(rng.uniform(1000, S - 1000, ES.MAX_VOICES), np.float32)),
    )

    F = args.frames
    D = args.chain
    import dataclasses as _dc

    if D:
        ys = render_chain(st, frames=F, out_channels=2, depth=D)
        float(np.asarray(ys[0]).sum())  # compile + settle
    blk, st2 = render_block(st, frames=F, out_channels=2)
    float(np.asarray(blk).sum())
    t0 = time.perf_counter()
    n = 0
    cur = st
    while time.perf_counter() - t0 < 5.0:
        if D:
            blks, acts, poss, clocks = render_chain(
                cur, frames=F, out_channels=2, depth=D)
            np.asarray(blks)  # ONE fetch for the whole burst
            cur = _dc.replace(cur, v_active=acts[-1], v_pos=poss[-1],
                              clock=clocks[-1])
            n += D
        else:
            blk, cur = render_block(cur, frames=F, out_channels=2)
            float(np.asarray(blk[-1]).sum())  # fetch-force each block
            n += 1
    dt = time.perf_counter() - t0
    bps = n / dt
    xrt = bps * F / rate
    print(f"voices={args.voices} frames={F} C={C} chain={D}: "
          f"{bps:.1f} blocks/s  {xrt:.1f}x realtime  "
          f"{xrt * args.voices:.0f} voice-sec/s")


if __name__ == "__main__":
    main()
