"""Pallas TPU kernel: the whole MP3 entropy scan in VMEM.

The XLA scan in ``huffman_device.decode_spectra`` is gather-bound: every
8-pair step re-gathers 2-3 bit-window rows per lane from HBM and each
pair pays one serial [N]-element gather into the 677k-entry flat code
LUT (~8 ns/lane, the generic-gather floor — docs/PERFORMANCE.md "Where
the MP3 fused program actually spends its time").  This kernel removes
every gather from the scan:

* Each lane's ENTIRE reachable bit span lives in VMEM for the whole
  walk: the ISO part2_3 bound (big-values crossing ``end_bit`` fails
  the lane — mpg123's part2 accounting, enforced identically by the
  host walkers and the XLA path) caps the span at 4095 bits + 127 bits
  of row alignment + ~430 bits of step lookahead ⇒ a static
  [W=160 words, L=128 lanes] slab per grid tile, pre-gathered once
  (20 8-word row gathers per lane vs 2-3 PER STEP before).
* The 677k-entry LUT gather becomes a 256-row BOUNDARY-COMPARE SUM:
  every big table is a complete prefix code, so the decode function
  entry(win) = len<<8|x<<4|y is piecewise-constant over left-aligned
  32-bit code starts with exactly n_codes ≤ 256 runs —
  ``entry = Σ_j d[j]·(win ≥ b[j])`` with per-lane (b, d) rows resident
  in VMEM.  Pure VPU compare/select/reduce; no memory indirection.
* count1 runs in the same kernel (the canonical ALU decode of
  huffman_device._c1_canonical_consts, no tables at all), so the whole
  entropy decode is ONE pallas_call; ``_assemble`` stitches unchanged.

Per-pair window reads mirror ``_win_at`` (13-candidate select tree +
64-bit funnel shift) over 14 words one-hot-extracted from the slab per
8-pair group.  Grid tiles are independent lane blocks; a scalar-prefetch
array carries each tile's big-loop trip count (max pairs in the tile),
so sparse tiles stop early instead of running the bucket cap.

Semantics are pinned bit-identical to the XLA path (same pair/fail/
write ordering, same overrun checks) by tests/test_mp3_pallas.py
(interpret mode; one shared compiled shape — the interpreted kernel's
CPU XLA compile runs minutes per shape) and by tools/mp3_scan_probe.py
on hardware (v5e, 2026-08-21: bit-exact over 14.2 M samples at the
benchmark lane scale; fused MP3 program 204 → 152 ms at 160 audio-sec
in the same window).  The mesh-sharded MP3 path keeps impl="xla"
(GSPMD cannot partition an opaque pallas_call; a shard_map composition
like ops.window_add_spmd's is the known follow-up).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import huffman_tables as HT
from .huffman_device import (
    _C1_LO4,
    _C1_LO5,
    _C1_NIB4,
    _C1_NIB5,
    _C1_NIB6,
    _KLIN,
    _KTID,
    _KTID_RESERVED,
)

L_TILE = 128       #: lanes per grid tile
W_WORDS = 160      #: slab words per lane (≥ (127 + 4095 + 430 + 32)/32)
PAIRS = 4          #: big-values pairs per loop group (8 output lines —
                   #: kept small: every unrolled pair costs minutes of
                   #: XLA-CPU compile in interpret mode; 8-row i32
                   #: stores stay sublane-aligned)
QUADS = 16         #: count1 quads per step (64 output lines)
NWIN = 9           #: words per group window — covers BOTH loops' spans:
                   #: big rem 31 + 3·47 + 19 + 32 = 223 bits, count1
                   #: rem 31 + 16·10 + 32 = 223 bits ≤ 8 words + spare
R_TAB = 256        #: boundary rows per table (max codes in a big table)


def _dense_tables():
    """(BTAB, DTAB) [16, 256] i32: per dense-table-row biased left-aligned
    code-start boundaries and entry deltas; row 0 = tid 0 (all-sentinel →
    entry 0).  KTID_DENSE maps the 32 table selects onto dense rows."""
    ids = sorted(HT.BIG_TABLES)
    btab = np.full((len(ids) + 1, R_TAB), np.iinfo(np.int32).max, np.int64)
    dtab = np.zeros((len(ids) + 1, R_TAB), np.int64)
    dense_of = {0: 0}
    for row, t in enumerate(ids, start=1):
        dense_of[t] = row
        ent = sorted(
            (code << (32 - length), (length << 8) | (x << 4) | y)
            for (x, y), (length, code) in HT.BIG_TABLES[t].items()
        )
        assert ent[0][0] == 0, "complete prefix code starts at 0"
        prev = 0
        for j, (b32, e) in enumerate(ent):
            btab[row, j] = np.int64(np.int32(np.uint32(b32) ^ 0x80000000))
            dtab[row, j] = e - prev
            prev = e
    ktid_dense = np.array([dense_of[max(t, 0)] for t in _KTID], np.int32)
    return (btab.astype(np.int32), dtab.astype(np.int32), ktid_dense)


_BTAB, _DTAB, _KTID_DENSE = _dense_tables()


def _win_tree(words, t):
    """32 bits at bit offset t (0 ≤ t < 32·(NWIN-1)) into the group's
    word window — ``_win_at``'s select tree + funnel shift, uint32."""
    idx = (t >> 5).astype(jnp.int32)
    his, los = list(words[:-1]), list(words[1:])
    level = 0
    while len(his) > 1:
        bit = ((idx >> level) & 1) == 1
        his = [
            jnp.where(bit, his[i + 1], his[i]) if i + 1 < len(his) else his[i]
            for i in range(0, len(his), 2)
        ]
        los = [
            jnp.where(bit, los[i + 1], los[i]) if i + 1 < len(los) else los[i]
            for i in range(0, len(los), 2)
        ]
        level += 1
    k_i = t & 31  # int32: Mosaic has no unsigned max (arith.maxui)
    k = k_i.astype(jnp.uint32)
    inv = (32 - jnp.maximum(k_i, 1)).astype(jnp.uint32)
    hi, lo = his[0], los[0]
    return jnp.where(k_i == 0, hi, (hi << k) | (lo >> inv))


def _take_bits(win, off, n):
    """n bits (vector n, 0 ≤ n ≤ 31) at offset off into a 32-bit window;
    n == 0 → 0 (mirrors huffman_device._take)."""
    v = (win << off.astype(jnp.uint32)) >> (
        32 - jnp.maximum(n, 1)
    ).astype(jnp.uint32)
    return jnp.where(n > 0, v, 0).astype(jnp.int32)


def _sel3(rows, region):
    """Per-lane select of one of three [1, L] rows by region ∈ {0,1,2}."""
    return jnp.where(
        region == 0, rows[0:1], jnp.where(region == 1, rows[1:2], rows[2:3])
    )


def _extract_words(slab, q0):
    """One-hot-extract NWIN consecutive words starting at per-lane word
    q0 from the [W, L] slab (per-lane dynamic VMEM indexing is not a
    vector primitive on TPU; a W-row compare+select+reduce per word is).
    Returns uint32 [1, L] words."""
    iota_w = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 0)
    out = []
    for j in range(NWIN):
        m = iota_w == (q0 + j)
        w = jnp.sum(jnp.where(m, slab, 0), axis=0, keepdims=True)
        out.append(w.astype(jnp.uint32))
    return out


def _entry_sum(btab, dtab, lo, wi):
    """Boundary-compare entry decode: Σ_j d[j]·(wi ≥ b[j]) over one
    256-row region block of the per-lane tables."""
    b = btab[lo:lo + R_TAB]
    d = dtab[lo:lo + R_TAB]
    m = wi >= b
    return jnp.sum(jnp.where(m, d, 0), axis=0, keepdims=True)


def _kernel(trips_ref, slab_ref, btab_ref, dtab_ref, scal_ref,
            big_ref, c1_ref, posfail_ref, *, n_c1s: int):
    t = pl.program_id(0)
    i32 = jnp.int32

    pos = scal_ref[0:1]          # [1, L] bit cursor, slab-relative
    ebits = scal_ref[1:2]        # part2_3 end (big fail + c1 act bound)
    sbits = scal_ref[2:3]        # readable-data end (c1 overrun bound)
    bigp = scal_ref[3:4]         # pairs to decode (min(big_values, n_big))
    r1 = scal_ref[4:5]
    r2 = scal_ref[5:6]
    linb = scal_ref[6:9]         # [3, L] per-region linbits
    res = scal_ref[9:12]         # per-region reserved-table flag
    wid = scal_ref[12:15]        # per-region tid>0 flag
    fail = scal_ref[15:16] > 0   # ~valid
    selb = scal_ref[16:17] > 0   # count1 table B
    idx0 = scal_ref[17:18]       # min(2*big_values, 576) line base

    big_ref[...] = jnp.zeros(big_ref.shape, big_ref.dtype)
    c1_ref[...] = jnp.zeros(c1_ref.shape, c1_ref.dtype)
    posfail_ref[...] = jnp.zeros(posfail_ref.shape, posfail_ref.dtype)
    slab = slab_ref[...]

    def decode_pair(words, off, pair2, fail):
        """One (x, y) pair at group-relative bit offset off; pair2 =
        2·pair_idx.  Mirrors huffman_device.decode_pair exactly."""
        act = (pair2 < 2 * bigp) & jnp.logical_not(fail)
        region = (pair2 >= r1).astype(i32) + (pair2 >= r2).astype(i32)
        t_res = _sel3(res, region)
        w_r = _sel3(wid, region)
        linb_r = _sel3(linb, region)
        win = _win_tree(words, off)
        wi = (win ^ jnp.uint32(0x80000000)).astype(i32)
        e0 = _entry_sum(btab_ref, dtab_ref, 0, wi)
        e1 = _entry_sum(btab_ref, dtab_ref, R_TAB, wi)
        e2 = _entry_sum(btab_ref, dtab_ref, 2 * R_TAB, wi)
        e = _sel3(jnp.concatenate([e0, e1, e2], axis=0), region)
        e = jnp.where(w_r > 0, e, 0)
        ln = e >> 8
        bad = act & ((t_res > 0) | ((w_r > 0) & (ln == 0)))
        x = (e >> 4) & 15
        y = e & 15
        win2 = _win_tree(words, off + jnp.where(w_r > 0, ln, 0))
        o = jnp.zeros_like(ln)
        xesc = (x == 15) & (linb_r > 0)
        x = x + jnp.where(xesc, _take_bits(win2, o, jnp.where(xesc, linb_r, 0)), 0)
        o = o + jnp.where(xesc, linb_r, 0)
        xs = _take_bits(win2, o, (x > 0).astype(i32))
        o = o + (x > 0)
        x = jnp.where(xs == 1, -x, x)
        yesc = (y == 15) & (linb_r > 0)
        y = y + jnp.where(yesc, _take_bits(win2, o, jnp.where(yesc, linb_r, 0)), 0)
        o = o + jnp.where(yesc, linb_r, 0)
        ys = _take_bits(win2, o, (y > 0).astype(i32))
        o = o + (y > 0)
        y = jnp.where(ys == 1, -y, y)
        consumed = jnp.where(act & (w_r > 0), ln + o, 0)
        return x, y, consumed, act, bad

    # loop state lives in the posfail VMEM block, NOT in fori carries —
    # Mosaic cannot legalize scf.for with vector loop-carried values
    # ("failed to legalize operation 'scf.for'"); refs are the
    # window_add-established pattern
    posfail_ref[0:1] = pos
    posfail_ref[1:2] = fail.astype(i32)

    def big_group(gi, carry):
        pos = posfail_ref[0:1]
        fail = posfail_ref[1:2] > 0
        q0 = jnp.minimum(pos >> 5, W_WORDS - NWIN)
        words = _extract_words(slab, q0)
        rem = pos - (q0 << 5)
        off = rem
        rows = []
        for sub in range(PAIRS):
            pair2 = 2 * (PAIRS * gi + sub)
            x, y, consumed, act, bad = decode_pair(words, off, pair2, fail)
            off = off + consumed
            fail = fail | bad | (act & (pos + off - rem > ebits))
            wr = act & jnp.logical_not(fail) & (pair2 < 576)
            rows.append(jnp.where(wr, x, 0))
            rows.append(jnp.where(wr, y, 0))
        blk = jnp.concatenate(rows, axis=0)  # [2*PAIRS, L] i32

        @pl.when(gi < 576 // (2 * PAIRS))
        def _():
            big_ref[pl.ds(pl.multiple_of(gi * 2 * PAIRS, 2 * PAIRS),
                          2 * PAIRS)] = blk

        posfail_ref[0:1] = pos + (off - rem)
        posfail_ref[1:2] = fail.astype(i32)
        return 0

    jax.lax.fori_loop(0, trips_ref[t], big_group, 0)

    # ---- count1: canonical ALU decode, same window machinery ----
    def c1_quad(win):
        w10 = (win >> 22).astype(i32)
        top4 = w10 >> 6
        top5 = w10 >> 5
        w6 = w10 >> 4
        is1 = (w10 >> 9) == 1
        is4 = top4 >= _C1_LO4
        is5 = top5 >= _C1_LO5
        v_a = jnp.where(
            is1, 0,
            jnp.where(
                is4, (_C1_NIB4 >> (4 * (top4 - _C1_LO4))) & 15,
                jnp.where(is5, (_C1_NIB5 >> (4 * (top5 - _C1_LO5))) & 15,
                          (_C1_NIB6 >> (4 * w6)) & 15)))
        l_a = jnp.where(is1, 1, jnp.where(is4, 4, jnp.where(is5, 5, 6)))
        v = jnp.where(selb, (~top4) & 15, v_a)
        ln = jnp.where(selb, 4, l_a)
        o = ln
        vals = []
        for q in range(4):
            bit = (v >> (3 - q)) & 1
            sgn = (w10 >> (9 - o)) & 1
            vals.append(jnp.where(bit == 1, 1 - 2 * sgn, 0))
            o = o + bit
        return o, vals

    # a fori (body compiled once) rather than a static unroll: each
    # extra unrolled step costs minutes of XLA-CPU compile in interpret
    # mode and compile time on the Mosaic side too; state rides the
    # posfail ref exactly like the big loop's
    def c1_step(step, carry):
        pos = posfail_ref[0:1]
        fail = posfail_ref[1:2] > 0
        q0 = jnp.minimum(pos >> 5, W_WORDS - NWIN)
        words = _extract_words(slab, q0)
        rem = pos - (q0 << 5)
        off = rem
        rows = []
        for sub in range(QUADS):
            placed = idx0 + 4 * (QUADS * step + sub)
            win = _win_tree(words, off)
            o, vals = c1_quad(win)
            act = (
                (pos + off - rem < ebits)
                & (placed < 576)
                & jnp.logical_not(fail)
            )
            o = jnp.where(act, o, 0)
            fail = fail | (act & (pos + off + o - rem > sbits))
            wr = act & jnp.logical_not(fail) & (pos + off + o - rem <= ebits)
            for q in range(4):
                rows.append(jnp.where(wr, vals[q], 0))
            off = off + o
        c1_ref[pl.ds(pl.multiple_of(step * 4 * QUADS, 8), 4 * QUADS)] = (
            jnp.concatenate(rows, axis=0))
        posfail_ref[0:1] = pos + (off - rem)
        posfail_ref[1:2] = fail.astype(i32)
        return 0

    jax.lax.fori_loop(0, n_c1s, c1_step, 0)


def _pad_to(x, n, axis=0, value=0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("n_big", "n_c1", "interpret"))
def entropy_scan(rows8, file_idx, start_bit, end_bit, limit_bit,
                 big_values, region1, region2, tsel, c1sel, valid,
                 *, n_big: int, n_c1: int, interpret: bool | None = None):
    """Fused big-values + count1 entropy scan (Pallas).

    Same lane contract as the two scans inside
    ``huffman_device.decode_spectra`` (which it replaces on TPU);
    returns (big576 [N, 576] i16, c1_out [N, 144, 4] i16, fail [N]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    i32 = jnp.int32
    N = start_bit.shape[0]
    n_big = min(max(n_big, 1), 512)
    n_c1 = min(max(n_c1, 1), 144)
    n_c1s = (n_c1 + QUADS - 1) // QUADS

    r0 = (start_bit >> 7).astype(i32)
    pos0 = jnp.where(valid > 0, start_bit - (r0 << 7), 0).astype(i32)
    r0 = jnp.where(valid > 0, r0, 0)
    ebits = jnp.where(valid > 0, end_bit - (r0 << 7), 0).astype(i32)
    sbits = jnp.where(valid > 0, limit_bit - (r0 << 7), 0).astype(i32)
    bigp = jnp.minimum(big_values, n_big).astype(i32)

    # per-lane slab: W_WORDS consecutive 32-bit words from the 128-bit
    # row base, via 8-word row gathers (rows at 4-word stride → step 2)
    nrows = rows8.shape[1]
    chunks = [
        rows8[file_idx, jnp.minimum(r0 + 2 * j, nrows - 1)]
        for j in range(W_WORDS // 8)
    ]
    slab = jnp.concatenate(chunks, axis=1).astype(i32)  # [N, W]

    # per-lane boundary/delta rows for the 3 regions → [768, N]
    tidd = jnp.asarray(_KTID_DENSE)[tsel]               # [N, 3]
    btab_l = jnp.asarray(_BTAB)[tidd].reshape(N, 3 * R_TAB)
    dtab_l = jnp.asarray(_DTAB)[tidd].reshape(N, 3 * R_TAB)

    lin = jnp.asarray(_KLIN)[tsel]                      # [N, 3]
    resv = jnp.asarray(_KTID_RESERVED)[tsel]
    widf = (jnp.asarray(_KTID)[tsel] > 0).astype(i32)
    fail0 = (jnp.logical_not(valid > 0)).astype(i32)
    selb = (c1sel > 0).astype(i32)
    idx0 = jnp.minimum(2 * big_values, 576).astype(i32)

    scal = jnp.stack(
        [pos0, ebits, sbits, bigp, region1.astype(i32), region2.astype(i32),
         lin[:, 0], lin[:, 1], lin[:, 2],
         resv[:, 0], resv[:, 1], resv[:, 2],
         widf[:, 0], widf[:, 1], widf[:, 2],
         fail0, selb, idx0,
         jnp.zeros_like(pos0), jnp.zeros_like(pos0),
         jnp.zeros_like(pos0), jnp.zeros_like(pos0),
         jnp.zeros_like(pos0), jnp.zeros_like(pos0)], axis=0)  # [24, N]

    Np = -(-N // L_TILE) * L_TILE
    nt = Np // L_TILE
    slab_t = _pad_to(slab, Np, axis=0).T
    btab_t = _pad_to(btab_l, Np, axis=0).T
    dtab_t = _pad_to(dtab_l, Np, axis=0).T
    scal_t = _pad_to(scal, Np, axis=1)
    # padding lanes: fail0 = 1 (row 15) so they never decode or write
    if Np != N:
        padm = jnp.arange(Np) >= N
        scal_t = scal_t.at[15].set(jnp.where(padm, 1, scal_t[15]))

    # per-tile big-loop trips: the max pair count in the tile (sparse
    # tiles stop early instead of running the bucket cap)
    bigp_live = jnp.where(valid > 0, bigp, 0)
    trips = (
        -(-jnp.max(_pad_to(bigp_live, Np).reshape(nt, L_TILE), axis=1)
          // PAIRS)
    ).astype(i32)

    c1_rows = n_c1s * 4 * QUADS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((W_WORDS, L_TILE), lambda t, *_: (0, t)),
            pl.BlockSpec((3 * R_TAB, L_TILE), lambda t, *_: (0, t)),
            pl.BlockSpec((3 * R_TAB, L_TILE), lambda t, *_: (0, t)),
            pl.BlockSpec((24, L_TILE), lambda t, *_: (0, t)),
        ],
        out_specs=[
            pl.BlockSpec((576, L_TILE), lambda t, *_: (0, t)),
            pl.BlockSpec((c1_rows, L_TILE), lambda t, *_: (0, t)),
            pl.BlockSpec((8, L_TILE), lambda t, *_: (0, t)),
        ],
    )
    big_t, c1_t, pf_t = pl.pallas_call(
        functools.partial(_kernel, n_c1s=n_c1s),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((576, Np), i32),
            jax.ShapeDtypeStruct((c1_rows, Np), i32),
            jax.ShapeDtypeStruct((8, Np), i32),
        ],
        interpret=interpret,
    )(trips, slab_t, btab_t, dtab_t, scal_t)

    big576 = big_t[:, :N].T.astype(jnp.int16)
    c1 = c1_t[:, :N].T.reshape(N, n_c1s * QUADS, 4)
    if n_c1s * QUADS < 144:
        c1 = jnp.pad(c1, ((0, 0), (0, 144 - n_c1s * QUADS), (0, 0)))
    else:
        c1 = c1[:, :144]
    fail = pf_t[1, :N] > 0
    return big576, c1.astype(jnp.int16), fail
