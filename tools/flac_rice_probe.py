"""TPU throughput probe for the round-3 device-FLAC rice scan.

Measures the core primitive the FLAC device decoder needs (ROADMAP
round-3 item 1): lane-parallel rice decoding with a serial bit cursor
per lane — the FLAC analogue of the MP3 Huffman scan, but with NO LUT
gathers: the unary quotient comes from count-leading-zeros on the bit
window and the remainder is a shift/mask, so each step is pure vector
ALU plus ONE 8-word row gather (the pattern docs/PERFORMANCE.md
measured as the gather sweet spot).

Per scan step each lane decodes CODES_PER_STEP zigzag rice codes from a
256-bit row window.  Worst-case bits consumed must fit the window past
the row-alignment slack: (q_max+1+param)*CODES_PER_STEP <= 224.

Run on the real chip:  python tools/flac_rice_probe.py
(report: Mcodes/s and the implied x-realtime for 44.1 kHz stereo).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

LANES = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
CODES_PER_LANE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
CODES_PER_STEP = int(sys.argv[3]) if len(sys.argv) > 3 else 8
PARAM = 8        # rice parameter (bits of remainder)
Q_MAX = 15       # probe data keeps unary runs below this
ROW_WORDS = 8    # 256-bit window rows


def synth_stream(rng, lanes: int, n_codes: int, n_unique: int = 32):
    """Random rice-coded streams.  Packing is Python-serial, so only
    ``n_unique`` distinct lanes are packed and then tiled to ``lanes``
    (identical per-lane content does not change TPU timing — control
    flow is data-independent).  Returns (truth [lanes, n_codes],
    words u32 [lanes, W])."""
    vals = rng.integers(-(1 << (PARAM + 3)), 1 << (PARAM + 3),
                        size=(n_unique, n_codes))
    words = np.zeros((n_unique,
                      (n_codes * (Q_MAX + 1 + PARAM)) // 32 + ROW_WORDS + 2),
                     np.uint32)
    for l in range(n_unique):
        acc = 0
        nbits = 0
        wi = 0
        for v in vals[l]:
            zz = (-int(v) << 1) - 1 if v < 0 else int(v) << 1
            q, r = min(zz >> PARAM, Q_MAX), zz & ((1 << PARAM) - 1)
            code = (1 << PARAM) | r  # q zeros, terminator 1, remainder
            n = q + 1 + PARAM
            acc = (acc << n) | code
            nbits += n
            while nbits >= 32:
                nbits -= 32
                words[l, wi] = (acc >> nbits) & 0xFFFFFFFF
                wi += 1
        if nbits:
            words[l, wi] = (acc << (32 - nbits)) & 0xFFFFFFFF
    # ground truth from the clamped quotients
    zz = np.where(vals < 0, (-vals.astype(np.int64) << 1) - 1,
                  vals.astype(np.int64) << 1)
    zz = (np.minimum(zz >> PARAM, Q_MAX) << PARAM) | (zz & ((1 << PARAM) - 1))
    truth = np.where(zz & 1, -((zz >> 1) + 1), zz >> 1)
    reps = (lanes + n_unique - 1) // n_unique
    return (np.tile(truth, (reps, 1))[:lanes].astype(np.int32),
            np.tile(words, (reps, 1))[:lanes])


def make_decoder(n_codes: int):
    """Rice scan on the MP3 scan's window machinery (huffman_device's
    ``_overlap_rows``/``_aligned_windows``/``_win_at``): one batch of
    row gathers per step, then a LOG-depth binary select tree per
    window read — vs. the naive per-code linear masked-sum picks that
    measured ~0.8 ms/code of VPU time."""
    from audio_decoder_tpu.codecs.mpeg.huffman_device import (
        _aligned_windows, _overlap_rows, _win_at)

    steps = n_codes // CODES_PER_STEP
    max_code_bits = Q_MAX + 1 + PARAM
    k_max = CODES_PER_STEP * max_code_bits

    @jax.jit
    def decode(words: jax.Array):  # u32 [L, W]
        L = words.shape[0]
        # pad so every row index a live cursor can produce is in range
        pad = (-words.shape[1]) % 4 + 16
        rows8 = _overlap_rows(jnp.pad(words, ((0, 0), (0, pad))))
        lane = jnp.arange(L)

        def step(carry, _):
            pos = carry  # i32 [L] absolute bit cursor
            a = _aligned_windows(rows8, lane, pos, k_max)
            off = jnp.zeros((L,), jnp.int32)
            outs = []
            for _k in range(CODES_PER_STEP):
                win = _win_at(a, off)  # 32 bits at the cursor
                q = lax.clz(win.astype(jnp.int32))
                # q+1+PARAM <= 32 here (probe keeps unary runs short),
                # so remainder bits come from the same window
                rem = (win >> (31 - q - PARAM).astype(jnp.uint32)) & (
                    (1 << PARAM) - 1
                )
                zz = ((q << PARAM) | rem.astype(jnp.int32)).astype(jnp.int32)
                outs.append((zz >> 1) ^ -(zz & 1))
                off = off + q + 1 + PARAM
            return pos + off, jnp.stack(outs, axis=1)  # [L, K]

        pos0 = jnp.zeros((L,), jnp.int32)
        _, ys = lax.scan(step, pos0, None, length=steps)
        # ys: [steps, L, K] → [L, steps*K]
        return jnp.transpose(ys, (1, 0, 2)).reshape(L, steps * CODES_PER_STEP)

    return decode


def main() -> None:
    rng = np.random.default_rng(0)
    print(f"[probe] synth {LANES} lanes x {CODES_PER_LANE} codes ...",
          flush=True)
    truth, words = synth_stream(rng, LANES, CODES_PER_LANE)
    decode = make_decoder(CODES_PER_LANE)
    dwords = jax.device_put(jnp.asarray(words))
    t0 = time.perf_counter()
    out = np.asarray(decode(dwords))
    t_compile = time.perf_counter() - t0
    ok = np.array_equal(out, truth)
    print(f"[probe] first run {t_compile:.1f}s  correct={ok}")
    if not ok:
        bad = np.argwhere(out != truth)
        print("  first mismatches:", bad[:4],
              out[tuple(bad[0])], truth[tuple(bad[0])])
        sys.exit(1)
    # Time with a SCALAR checksum fetch: fetching the full [L, N] i32
    # output (32 MB at default sizes) is pure tunnel wire time and
    # swamped the early probe runs 100:1 — the device program itself is
    # ~11 ms (tools/tpu_trace.py hlo_stats; two row gathers/step at
    # ~42 us each are the entire cost, the rice ALU is noise).
    csum = jax.jit(lambda w: decode(w).sum())
    np.asarray(csum(dwords))  # warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(csum(dwords))  # scalar fetch forces execution
        best = min(best, time.perf_counter() - t0)
    ncodes = LANES * CODES_PER_LANE
    rate = ncodes / best
    # FLAC stereo 44.1 kHz consumes 88.2k codes per audio-second
    print(f"[probe] best {best*1e3:.1f} ms for {ncodes/1e6:.1f} M codes "
          f"= {rate/1e6:.0f} Mcodes/s ≈ {rate/88200:.0f}x realtime "
          f"(44.1k stereo)")


if __name__ == "__main__":
    main()
