"""On-device (TPU) MPEG-1 Layer III Huffman decode.

The final form of the decode split: the host walks frames and parses only
the *fixed-size* structures (headers, side info, scalefactors — a few
hundred bits per frame), and ships the RAW concatenated main_data bytes to
the device (~16 KB per 10 s file at 128 kbps — two orders of magnitude
less than dense spectra).  The variable-length entropy decode itself runs
here as a lane-parallel XLA program: one lane per granule-channel, all
lanes stepping their own bit cursors simultaneously through flat Huffman
prefix LUT gathers.

Key structural facts that make this TPU-friendly:

* the bit reservoir (ISO 2.4.2.7 main_data_begin) makes granule *windows*
  overlap frames, but window byte ranges are fully determined by side
  info — so every lane's [start_bit, end_bit) is known before any entropy
  decode, and lanes are INDEPENDENT;
* big-values pair k lands at lines (2k, 2k+1) — a static index — so the
  decode loop writes to a dense [lane, step] tensor with no scatter;
* count1 quad k lands at lines 2*big_values + 4k — a per-lane constant
  offset — so final line assembly is one gather.

Everything matches the host reference front-end bit-for-bit on valid
streams (tests cross-check is_q equality); the reference's decode is a
TODO (blast/src/main.rs:44-54), so all of this is green-field.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import huffman_tables as HT
from . import tables as T

# ---------------------------------------------------------------------------
# Flat LUT constants (device-resident, baked into the jitted program)
# ---------------------------------------------------------------------------


def _flat_big_luts():
    """Concatenate per-table prefix LUTs: entry = len<<8 | x<<4 | y."""
    ids = sorted(HT.BIG_TABLES)
    base = np.zeros(33, np.int32)  # indexed by table id (0..24 used)
    width = np.zeros(33, np.int32)
    chunks = [np.zeros(1, np.uint16)]  # slot 0: safe row for tid==0
    off = 1
    for t in ids:
        codes = HT.BIG_TABLES[t]
        maxlen = max(l for (l, _c) in codes.values())
        lut = np.zeros(1 << maxlen, np.uint16)
        for (x, y), (length, code) in codes.items():
            lo = code << (maxlen - length)
            hi = (code + 1) << (maxlen - length)
            lut[lo:hi] = (length << 8) | (x << 4) | y
        base[t] = off
        width[t] = maxlen
        chunks.append(lut)
        off += lut.size
    return np.concatenate(chunks), base, width


_BIGLUT, _BIG_BASE, _BIG_WIDTH = _flat_big_luts()

_KTID = np.array([max(HT.TABLE_INFO[i][0], 0) for i in range(32)], np.int32)
_KTID_RESERVED = np.array(
    [1 if HT.TABLE_INFO[i][0] < 0 else 0 for i in range(32)], np.int32
)
_KLIN = np.array([HT.TABLE_INFO[i][1] for i in range(32)], np.int32)


def _c1_canonical_consts():
    """Derive the count1 threshold-decode constants from COUNT1_TABLES.

    Both count1 trees are COMPLETE (all 64 / 16 prefixes terminate) and
    THRESHOLD-DECODABLE: at every depth the still-incomplete prefixes
    form one value interval strictly below the finished codes (verified
    programmatically here, not assumed), so a quad's (length, value)
    falls out of a handful of compares on the next 6 bits — no table
    gather at all.  Select B is the degenerate case: every code is 4
    bits with ``v = ~code & 15``.  Select A's per-length value maps are
    packed as nibble strings indexed by the code's rank above the
    length's first code, so the "lookup" is a vector shift.

    Returns (lo4, lo5, nib4, nib5, nib6): the length-4/5 first-code
    thresholds and the rank→v nibble packs for lengths 4, 5, 6."""
    codes = HT.COUNT1_TABLES[0]
    bylen: dict[int, list] = {}
    for v, (ln, c) in codes.items():
        bylen.setdefault(ln, []).append((c, v))
    assert sorted(bylen) == [1, 4, 5, 6] and bylen[1] == [(1, 0)]
    packs = {}
    los = {}
    for ln in (4, 5, 6):
        ent = sorted(bylen[ln])
        cs = [c for c, _ in ent]
        assert cs == list(range(cs[0], cs[0] + len(cs))), "non-canonical"
        los[ln] = cs[0]
        packs[ln] = sum(v << (4 * r) for r, (_c, v) in enumerate(ent))
    # completeness / threshold checks: len-4 codes sit at [lo4, 8) under
    # the len-1 code's half, len-5 at [lo5, 2*lo4), len-6 at [0, 2*lo5)
    assert los[4] + len(bylen[4]) == 8
    assert los[5] + len(bylen[5]) == 2 * los[4]
    assert len(bylen[6]) == 2 * los[5]
    return los[4], los[5], packs[4], packs[5], packs[6]


_C1_LO4, _C1_LO5, _C1_NIB4, _C1_NIB5, _C1_NIB6 = _c1_canonical_consts()

#: short-block reorder permutations in gather form out = in[perm],
#: [9 rates, 3 cfgs, 576]; cfg 0 (long) rows are identity.
def _reorder_perms():
    rates = T.RATE_ORDER
    p = np.tile(np.arange(576, dtype=np.int32), (len(rates), 3, 1))
    for r, sr in enumerate(rates):
        bands = T.SFB_SHORT[sr]
        for cfg, mixed in ((1, 0), (2, 1)):
            for sfb in range(3 if mixed else 0, 13):
                lo, hi = int(bands[sfb]), int(bands[sfb + 1])
                w_ = hi - lo
                base = lo * 3
                for i in range(w_):
                    for w in range(3):
                        p[r, cfg, base + i * 3 + w] = base + w * w_ + i
    return p


_REORDER = _reorder_perms()


# ---------------------------------------------------------------------------
# Bit-window gathers
# ---------------------------------------------------------------------------


def _be_words(main_u8: jax.Array) -> jax.Array:
    """uint8 [B, M] (M % 4 == 0) → big-endian uint32 words [B, W].

    W is padded to a multiple of 8 plus six spare 8-word rows: window
    reads gather whole rows (``_aligned_windows``), and the padding
    guarantees every row index a live lane can produce — including the
    ≤ 376-bit overshoot of the step that trips the limit check — is in
    range WITHOUT clipping (clipping would silently shift the window
    base and mis-decode lanes whose data ends near the buffer end)."""
    B = main_u8.shape[0]
    b = main_u8.reshape(B, -1, 4).astype(jnp.uint32)
    w = (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]
    pad = (-w.shape[1]) % 8 + 48
    return jnp.pad(w, ((0, 0), (0, pad)))


def _shift64(hi: jax.Array, lo: jax.Array, k: jax.Array) -> jax.Array:
    """The 32 bits starting k (0..31) bits into the (hi, lo) window."""
    k = k.astype(jnp.uint32)
    return jnp.where(k == 0, hi, (hi << k) | (lo >> (32 - jnp.maximum(k, 1))))


def _overlap_rows(words: jax.Array) -> jax.Array:
    """[B, W] words → [B, W/4 - 1, 8] rows at 4-word stride (row r =
    words[4r : 4r+8]).  The half-stride halves the worst-case alignment
    waste of a window's row base (rem < 128 bits instead of < 256), which
    is what lets linbits-light scan steps fit 2 rows instead of 3; the
    2× materialization is one cheap HBM relayout per program."""
    B, W = words.shape
    w4 = words.reshape(B, W // 4, 4)
    return jnp.concatenate([w4[:, :-1], w4[:, 1:]], axis=-1)


def _aligned_windows(rows8, file_idx, bitpos, k_max: int):
    """Bit-window access covering offsets [0, k_max] from bitpos per lane
    (each _win_at(a, k) reads 32 bits plus a 32-bit lookahead word).

    Gathers whole 8-word ROWS instead of single words: a TPU gather's
    cost is per *index*, nearly independent of a small trailing slice
    width, so R row gathers fetch the span ~3-4× faster than the 8R
    single-word gathers they replace (measured 44 ms vs 145 ms for a
    13-word span over 2^20 lanes).  Rows come from ``_overlap_rows`` at
    4-word stride; consecutive gathered rows step by 2 so the fetched
    words are contiguous.  Returns (cols, rem): ``cols`` = the 8R raw
    words from the 4-word-aligned base below bitpos, ``rem`` = bitpos −
    128·row0 ∈ [0, 128) — ``_win_at`` folds rem into its offset, so no
    pre-shift alignment pass is needed."""
    idx_max = (127 + k_max) // 32 + 1  # worst lo-word index in cols
    R = idx_max // 8 + 1
    r0 = (bitpos >> 7).astype(jnp.int32)
    rows = [rows8[file_idx, r0 + 2 * j] for j in range(R)]  # R x [N, 8]
    cols = [r[:, i] for r in rows for i in range(8)]
    return cols, (bitpos & 127).astype(jnp.int32)


def _win_at(a, k: jax.Array) -> jax.Array:
    """32 bits at offset k (0 <= k < 32*(n-1)) into a window span from
    ``_aligned_windows``.

    Selects the (hi, lo) word pair with a binary tree keyed on the bits
    of (rem+k)>>5, then does ONE 64-bit funnel shift — ~2 selects per
    candidate word instead of a full shift64+mask per word (this runs
    twice per decoded pair, so its VPU cost is a first-order term of
    the scan)."""
    cols, rem = a
    q = rem + k
    idx = (q >> 5).astype(jnp.int32)
    his, los = list(cols[:-1]), list(cols[1:])
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
    return _shift64(his[0], los[0], (q & 31).astype(jnp.uint32))


def _take(win: jax.Array, off: jax.Array, n: jax.Array) -> jax.Array:
    """Extract n bits (vector n, 0 ≤ n ≤ 31) at offset off from a 32-bit
    window; n == 0 yields 0."""
    v = (win << off.astype(jnp.uint32)) >> (32 - jnp.maximum(n, 1)).astype(jnp.uint32)
    return jnp.where(n > 0, v, 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Lane-parallel entropy decode
# ---------------------------------------------------------------------------


def decode_spectra(
    main_u8: jax.Array,
    file_idx: jax.Array,
    start_bit: jax.Array,
    end_bit: jax.Array,
    limit_bit: jax.Array,
    big_values: jax.Array,
    region1: jax.Array,
    region2: jax.Array,
    tsel: jax.Array,
    c1sel: jax.Array,
    valid: jax.Array,
    rate_idx: jax.Array,
    cfg: jax.Array,
    *,
    n_big: int = 512,
    n_c1: int = 144,
    impl: str = "xla",
) -> tuple[jax.Array, jax.Array]:
    """Decode all granule-channel lanes' quantized spectra on device.

    Args (N = number of lanes = B*G*C):
      main_u8: uint8 [B, M] concatenated main_data streams (M % 4 == 0).
      file_idx: int32 [N] lane → file row.
      start_bit/end_bit: int32 [N] Huffman bit range (post-scalefactors).
      limit_bit: int32 [N] end of readable data for the lane's frame
        (reads past it fail the lane, mirroring the host's overrun check).
      big_values / region1 / region2: int32 [N] (region* = line bounds).
      tsel: int32 [N, 3] table selects; c1sel: int32 [N] count1 select.
      valid: bool/int [N] lane decodable (reservoir present etc).
      rate_idx: int32 [N] sample-rate index; cfg: int32 [N] 0 long, 1
        short, 2 mixed — selects the reorder permutation.

    Returns:
      (lines int16 [N, 576] in final line order, fail bool [N]).
    """
    N = start_bit.shape[0]
    i32 = jnp.int32
    rows8 = _overlap_rows(_be_words(main_u8))
    if impl == "pallas":
        # whole entropy scan as one Mosaic kernel (VMEM-resident lane
        # spans + boundary-compare code decode, zero gathers in the
        # walk) — bit-identical to the XLA scans below by construction
        # and by tests/test_mp3_pallas.py
        from .huffman_pallas import entropy_scan

        big576, c1_out, fail = entropy_scan(
            rows8, file_idx, start_bit, end_bit, limit_bit, big_values,
            region1, region2, tsel, c1sel, valid,
            n_big=n_big, n_c1=n_c1)
        return _assemble(big576, c1_out, big_values, fail, rate_idx, cfg)
    sbits = limit_bit
    ebits = end_bit
    # big_values can exceed 288 pairs (576 lines): the extra pairs are
    # decoded for their BIT CONSUMPTION (the count1 cursor depends on it)
    # even though only the first 288 store lines.
    n_big = min(max(n_big, 1), 512)
    n_c1 = min(max(n_c1, 1), 144)

    big_pairs = jnp.minimum(big_values, n_big).astype(i32)
    tid = jnp.asarray(_KTID)[tsel]  # [N, 3] big-table id per region
    reserved = jnp.asarray(_KTID_RESERVED)[tsel]
    lin = jnp.asarray(_KLIN)[tsel]
    kbase = jnp.asarray(_BIG_BASE)[tid]
    kwidth = jnp.asarray(_BIG_WIDTH)[tid]
    biglut = jnp.asarray(_BIGLUT)

    def sel3(a, region):  # per-lane region select without a gather
        return jnp.where(
            region == 0, a[:, 0], jnp.where(region == 1, a[:, 1], a[:, 2])
        )

    # ---- big-values region: 2 pairs per step from ONE 5-word gather ----
    # Worst case per pair: 19-bit code + 13+1+13+1 escape/sign = 47 bits;
    # two pairs end <= 94 bits in, reads reach <= 98 bits; +31 alignment
    # fits in 129 <= 160 bits (5 aligned windows).
    def decode_pair(a, off, pair_idx, fail):
        """One (x, y) pair at bit offset `off` into aligned windows `a`."""
        act = (pair_idx < big_pairs) & jnp.logical_not(fail)
        line = 2 * pair_idx
        region = (line >= region1).astype(i32) + (line >= region2).astype(i32)
        t_res = sel3(reserved, region)
        width = sel3(kwidth, region)
        base = sel3(kbase, region)
        linb = sel3(lin, region)
        win = _win_at(a, off)
        idx = base + (
            win >> (32 - jnp.maximum(width, 1)).astype(jnp.uint32)
        ).astype(i32)
        entry = biglut[jnp.where(width > 0, idx, 0)].astype(i32)
        ln = entry >> 8
        bad = act & ((t_res > 0) | ((width > 0) & (ln == 0)))
        x = (entry >> 4) & 15
        y = entry & 15
        win2 = _win_at(a, off + jnp.where(width > 0, ln, 0))
        o = jnp.zeros((N,), i32)
        xesc = (x == 15) & (linb > 0)
        x = x + jnp.where(xesc, _take(win2, o, jnp.where(xesc, linb, 0)), 0)
        o = o + jnp.where(xesc, linb, 0)
        xs = _take(win2, o, jnp.where(x > 0, 1, 0))
        o = o + (x > 0)
        x = jnp.where(xs == 1, -x, x)
        yesc = (y == 15) & (linb > 0)
        y = y + jnp.where(yesc, _take(win2, o, jnp.where(yesc, linb, 0)), 0)
        o = o + jnp.where(yesc, linb, 0)
        ys = _take(win2, o, jnp.where(y > 0, 1, 0))
        o = o + (y > 0)
        y = jnp.where(ys == 1, -y, y)
        consumed = jnp.where(act & (width > 0), ln + o, 0)
        return x, y, consumed, act, bad

    # 8 pairs per step: the last pair starts <= 7*47 = 329 bits in and its
    # trailing 32-bit window read begins <= 329 + 19 = 348 bits in — with
    # the half-stride row base (rem < 128) that's word 15 of 16, so TWO
    # 8-word row gathers cover the worst case.  (16-pair steps measured
    # WORSE: same window words but the 32-column select tree's extra VPU
    # depth exceeds the halved step overhead.)
    PAIRS = 8
    n_bigS = (n_big + PAIRS - 1) // PAIRS

    def big_step(carry, step):
        pos, fail = carry
        a = _aligned_windows(rows8, file_idx, pos, 348)
        off = jnp.zeros((N,), i32)
        cols = []
        for sub in range(PAIRS):
            pair_idx = PAIRS * step + sub
            x, y, consumed, act, bad = decode_pair(a, off, pair_idx, fail)
            off = off + consumed
            # ISO: the big-values region lies inside part2_3_length;
            # crossing end_bit is stream corruption (mpg123's part2
            # accounting; host raises "huffman overrun").  This also
            # bounds every lane's reachable bit span to end_bit + one
            # step's lookahead — the invariant the Pallas scan's static
            # per-lane VMEM window relies on.
            fail = fail | bad | (act & (pos + off > ebits))
            wr = act & jnp.logical_not(fail) & (pair_idx < 288)
            cols.append(jnp.where(wr, x, 0))
            cols.append(jnp.where(wr, y, 0))
        pos = pos + off
        return (pos, fail), jnp.stack(cols, axis=-1).astype(jnp.int16)

    pos0 = jnp.where(valid > 0, start_bit, 0).astype(i32)
    fail0 = jnp.logical_not(valid > 0)
    (pos, fail), big_seq = jax.lax.scan(
        big_step, (pos0, fail0), jnp.arange(n_bigS, dtype=i32)
    )
    big_out = jnp.moveaxis(big_seq, 0, 1).reshape(N, n_bigS * PAIRS, 2)
    if n_bigS * PAIRS < 288:
        big_out = jnp.pad(big_out, ((0, 0), (0, 288 - n_bigS * PAIRS), (0, 0)))
    else:
        big_out = big_out[:, :288]

    # ---- count1 region: 32 quads per step of pure-ALU canonical decode
    # from TWO 8-word row gathers ----
    # Both count1 trees are complete and threshold-decodable (constants
    # derived + verified in _c1_canonical_consts), so a quad's
    # (length, value) is ~a dozen fused VPU ops on the next 10 bits and
    # the signs are plain bit extracts.  This replaced an 8 MB
    # double-quad LUT whose one serial [N]-element gather per 2 quads
    # (~8 ns/lane on TPU, the generic-gather floor) made count1 ~40% of
    # the whole Huffman scan wall; the ALU form has NO gathers beyond
    # the shared window rows.
    idx0 = jnp.minimum(2 * big_values, 576).astype(i32)
    QUADS = 32
    n_c1S = (n_c1 + QUADS - 1) // QUADS
    sel_b = c1sel > 0

    def c1_quad(win):
        """(length incl. signs, 4 line values) from an aligned window."""
        w10 = (win >> 22).astype(i32)
        # select A: depth-1/4/5/6 threshold tree on the top 6 bits
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
        # select B: constant 4-bit codes, v = ~code
        v = jnp.where(sel_b, (~top4) & 15, v_a)
        ln = jnp.where(sel_b, 4, l_a)
        # signs trail the code MSB-line-first; o <= ln+3 <= 9 fits w10
        o = ln
        vals = []
        for q in range(4):
            bit = (v >> (3 - q)) & 1
            sgn = (w10 >> (9 - o)) & 1
            vals.append(jnp.where(bit == 1, 1 - 2 * sgn, 0))
            o = o + bit
        return o, vals

    def c1_step(carry, step):
        pos, fail = carry
        a = _aligned_windows(rows8, file_idx, pos, 330)
        off = jnp.zeros((N,), i32)
        vals16 = []
        for sub in range(QUADS):
            placed = idx0 + 4 * (QUADS * step + sub)
            win = _win_at(a, off)
            o, vals = c1_quad(win)
            act = (
                (pos + off < end_bit)
                & (placed < 576)
                & jnp.logical_not(fail)
            )
            o = jnp.where(act, o, 0)
            fail = fail | (act & (pos + off + o > sbits))
            # a quad straddling the part2_3 boundary is discarded
            wr = act & jnp.logical_not(fail) & (pos + off + o <= end_bit)
            for q in range(4):
                vals16.append(jnp.where(wr, vals[q], 0))
            off = off + o
        pos = pos + off
        out = jnp.stack(vals16, axis=-1).astype(jnp.int16)  # [N, QUADS*4]
        return (pos, fail), out

    (pos, fail), c1_seq = jax.lax.scan(
        c1_step, (pos, fail), jnp.arange(n_c1S, dtype=i32)
    )
    c1_out = jnp.moveaxis(c1_seq, 0, 1).reshape(N, n_c1S * QUADS, 4)
    if n_c1S * QUADS < 144:
        c1_out = jnp.pad(c1_out, ((0, 0), (0, 144 - n_c1S * QUADS), (0, 0)))
    else:
        c1_out = c1_out[:, :144]

    return _assemble(big_out, c1_out, big_values, fail, rate_idx, cfg)


def _assemble(big_out, c1_out, big_values, fail, rate_idx, cfg):
    """Stitch big-values pairs + count1 quads into 576 lines, reordered.

    Gather-free on purpose — per-lane dynamic gathers are the slowest op
    class on TPU.  Big pairs are already line-ordered (pair k = lines
    2k/2k+1); the count1 block moves to its per-lane offset 2*big_values
    with a barrel shifter (10 masked static shifts); the short-block
    reorder applies every static permutation variant and masks (6 cheap
    relayouts beat one 18M-element dynamic gather ~30x here)."""
    N = big_out.shape[0]
    j = jnp.arange(576)
    bv2 = jnp.minimum(2 * big_values, 576)[:, None]  # [N,1]
    big_flat = big_out.reshape(N, 576)  # line j = big pair j>>1 — in order

    # barrel-shift count1 lines right by 2*big_values (even, <= 576)
    c1 = c1_out.reshape(N, 576)
    shift = bv2[:, 0] >> 1  # in units of 2 lines
    for k in range(9):  # shift/2 in [0, 288] → 9 bits
        step = 2 << k
        shifted = jnp.pad(c1, ((0, 0), (step, 0)))[:, :576]
        c1 = jnp.where(((shift >> k) & 1)[:, None] == 1, shifted, c1)

    lines = jnp.where(j < bv2, big_flat, c1)
    lines = jnp.where(fail[:, None], 0, lines)

    # short-block reorder: static permutation variants + masked select.
    # Distinct permutations are shared across rates (band tables repeat),
    # so dedupe before emitting variants.
    perms = _REORDER  # [9 rates, 3 cfgs, 576] (cfg 0 rows are identity)
    out = lines
    seen: dict[bytes, list] = {}
    for r in range(perms.shape[0]):
        for c in (1, 2):
            seen.setdefault(perms[r, c].tobytes(), []).append((r, c))
    for key, rcs in seen.items():
        perm = np.frombuffer(key, dtype=perms.dtype)
        variant = lines[:, jnp.asarray(perm)]
        m = jnp.zeros_like(cfg, dtype=bool)
        for r, c in rcs:
            m = m | ((rate_idx == r) & (cfg == c))
        out = jnp.where(m[:, None], variant, out)
    return out.astype(jnp.int16), fail
