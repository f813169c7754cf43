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


def _c1_lut():
    lut = np.zeros(2 * 64, np.uint16)  # entry = len<<4 | v
    for s in (0, 1):
        for v, (length, code) in HT.COUNT1_TABLES[s].items():
            lo = code << (6 - length)
            hi = (code + 1) << (6 - length)
            lut[s * 64 + lo : s * 64 + hi] = (length << 4) | v
    return lut


_C1LUT = _c1_lut()


def _c1_double_lut():
    """Two count1 quads per lookup: a quad is ≤ 6 code bits + 4 sign bits,
    so TWO full quads (values AND signs) always fit in 20 bits — one
    gather decodes both and the per-sign bit extraction disappears.
    Entry (int32): len1(5) | len2<<5 | bad1<<10 | bad2<<11 |
    vals<<12 (8 × 2-bit fields, value+1 in {0,1,2}, quad1 lines first,
    each quad MSB-line-first to match the (v >> (3-q)) & 1 order)."""
    # single-quad 10-bit LUT with signs folded in, per select
    s_len = np.zeros((2, 1024), np.int32)
    s_bad = np.zeros((2, 1024), np.int32)
    s_vals = np.zeros((2, 1024), np.int32)  # 8 bits: 4 × 2-bit fields
    for s in (0, 1):
        for b in range(1024):
            e = int(_C1LUT[s * 64 + (b >> 4)])
            ln, v = e >> 4, e & 15
            if ln == 0:
                s_bad[s, b] = 1
                continue
            o = ln
            fields = 0
            for q in range(4):
                bit = (v >> (3 - q)) & 1
                val = 0
                if bit:
                    sgn = (b >> (9 - o)) & 1
                    o += 1
                    val = -1 if sgn else 1
                fields |= (val + 1) << (6 - 2 * q)
            s_len[s, b] = o
            s_vals[s, b] = fields
    # compose: first quad from the top 10 bits, second from the next
    idx = np.arange(1 << 20)
    top = (idx >> 10).astype(np.int32)
    out = np.zeros((2, 1 << 20), np.int32)
    for s in (0, 1):
        l1 = s_len[s, top]
        b1 = s_bad[s, top]
        v1 = s_vals[s, top]
        second = (idx >> (10 - l1)) & 1023
        l2 = s_len[s, second]
        b2 = s_bad[s, second]
        v2 = s_vals[s, second]
        out[s] = (
            l1 | (l2 << 5) | (b1 << 10) | (b2 << 11) | (v1 << 12) | (v2 << 20)
        )
    return out.reshape(-1)


_C1DLUT = _c1_double_lut()

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
    sbits = limit_bit
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
            fail = fail | bad | (act & (pos + off > sbits))
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

    # ---- count1 region: 32 quads = 16 double-LUT lookups per step from
    # TWO 8-word row gathers ----
    # A quad is <= 6 code bits + 4 signs = 10 bits, so TWO quads (values
    # and signs) fit in 20 LUT-index bits: one gather decodes both.  The
    # last lookup starts <= 15*20 = 300 bits in; with rem < 128 its lo
    # word is index (127+300+31)>>5 = 14 of 16 — still two rows, so the
    # wider step halves the trip count at the same window cost.
    idx0 = jnp.minimum(2 * big_values, 576).astype(i32)
    c1dlut = jnp.asarray(_C1DLUT)
    QUADS = 32
    n_c1S = (n_c1 + QUADS - 1) // QUADS

    def c1_step(carry, step):
        pos, fail = carry
        a = _aligned_windows(rows8, file_idx, pos, 300)
        off = jnp.zeros((N,), i32)
        vals16 = []
        for sub in range(QUADS // 2):
            win = _win_at(a, off)
            entry = c1dlut[(c1sel << 20) + (win >> 12).astype(i32)]
            l1 = entry & 31
            l2 = (entry >> 5) & 31
            for half, (ln, bad_bit, vsh) in enumerate(
                ((l1, 10, 12), (l2, 11, 20))
            ):
                placed = idx0 + 4 * (QUADS * step + 2 * sub + half)
                act = (
                    (pos + off < end_bit)
                    & (placed < 576)
                    & jnp.logical_not(fail)
                )
                bad = act & (((entry >> bad_bit) & 1) == 1)
                o = jnp.where(act, ln, 0)
                fail = fail | bad | (act & (pos + off + o > sbits))
                # a quad straddling the part2_3 boundary is discarded
                wr = act & jnp.logical_not(fail) & (pos + off + o <= end_bit)
                for q in range(4):
                    fld = (entry >> (vsh + 6 - 2 * q)) & 3
                    vals16.append(jnp.where(wr, fld - 1, 0))
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
