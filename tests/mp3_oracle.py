"""Scalar NumPy MPEG-1 Layer III decode oracle.

A complete, deliberately-straightforward frame-by-frame decoder implementing
ISO/IEC 11172-3: frame sync, side info, bit reservoir, scalefactors,
Huffman, requantization, reorder, MS/intensity stereo, antialias, hybrid
IMDCT, and the polyphase synthesis filterbank.  It serves as the
ground-truth for the batched TPU decoder (stage-by-stage comparisons) and
is itself validated against the system mpg123 decoder in tests/test_mp3.py.

The reference's mpeg.rs stops at frame discovery (decode is its TODO,
blast/src/main.rs:44-54); everything below frame framing is green-field.
"""

from __future__ import annotations

import numpy as np

from audio_decoder_tpu.codecs.mpeg import huffman_tables as HT
from audio_decoder_tpu.codecs.mpeg import tables as T


class Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes):
        self.data = np.frombuffer(bytes(data), np.uint8)
        self.pos = 0  # bit position

    def get(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((int(byte) >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def get1(self) -> int:
        byte = int(self.data[self.pos >> 3])
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit


# Decode maps: (length, code) -> value, per table.
_DEC_BIG = {
    t: {lc: xy for xy, lc in codes.items()} for t, codes in HT.BIG_TABLES.items()
}
_DEC_C1 = {
    s: {lc: v for v, lc in codes.items()} for s, codes in HT.COUNT1_TABLES.items()
}
_MAXLEN_BIG = {t: max(l for l, _ in m) for t, m in _DEC_BIG.items()}


def _huff_decode(bits: Bits, dec: dict, maxlen: int):
    code, length = 0, 0
    while length <= maxlen:
        code = (code << 1) | bits.get1()
        length += 1
        hit = dec.get((length, code))
        if hit is not None:
            return hit
    raise ValueError("invalid huffman code")


def parse_header(word: int) -> dict | None:
    """Decode a 32-bit header word (fields per mpeg.rs:367-496, corrected
    bitrate column select)."""
    if (word >> 21) & 0x7FF != 0x7FF:
        return None
    version = (word >> 19) & 3
    layer = (word >> 17) & 3
    crc = not ((word >> 16) & 1)
    br_idx = (word >> 12) & 0xF
    sr_idx = (word >> 10) & 3
    padding = (word >> 9) & 1
    mode = (word >> 6) & 3
    mode_ext = (word >> 4) & 3
    if version == 1 or layer == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = int(T.BITRATE_KBPS[br_idx - 1][T.bitrate_column(version, layer)]) * 1000
    sr = T.SAMPLE_RATES[version][sr_idx]
    if layer == 1:  # Layer III
        slots = 144 * bitrate // sr + padding
        if version != 3:
            slots = 72 * bitrate // sr + padding
    elif layer == 2:  # Layer II
        slots = 144 * bitrate // sr + padding
    else:  # Layer I
        slots = (12 * bitrate // sr + padding) * 4
    return dict(
        version=version, layer=layer, crc=crc, bitrate=bitrate, sr=sr,
        padding=padding, mode=mode, mode_ext=mode_ext, frame_len=int(slots),
        channels=1 if mode == 3 else 2,
    )


def find_frames(blob: bytes) -> list[tuple[int, dict]]:
    """Frame scan shared with the package front-end (ID3v2 + Xing/Info/
    VBRI tag handling, free-format length measurement)."""
    from audio_decoder_tpu.codecs.mpeg import frontend as FE

    return FE.find_frames(blob)


def _read_side_info(bits: Bits, channels: int, version: int = 3) -> dict:
    lsf = version != 3
    si = dict(main_data_begin=bits.get(8 if lsf else 9))
    if lsf:
        bits.get(1 if channels == 1 else 2)  # private bits
        si["scfsi"] = [[0] * 4 for _ in range(channels)]
        ngr = 1
    else:
        bits.get(5 if channels == 1 else 3)
        si["scfsi"] = [[bits.get1() for _ in range(4)] for _ in range(channels)]
        ngr = 2
    si["ngr"] = ngr
    si["gr"] = []
    for _gr in range(ngr):
        chs = []
        for _ch in range(channels):
            g = dict(
                part2_3_length=bits.get(12),
                big_values=bits.get(9),
                global_gain=bits.get(8),
                scalefac_compress=bits.get(9 if lsf else 4),
                window_switching=bits.get1(),
            )
            if g["window_switching"]:
                g["block_type"] = bits.get(2)
                g["mixed"] = bits.get1()
                g["table_select"] = [bits.get(5), bits.get(5), 0]
                g["subblock_gain"] = [bits.get(3) for _ in range(3)]
                g["region0_count"] = 7
                g["region1_count"] = 36  # unused; region1 runs to 576
            else:
                g["block_type"] = 0
                g["mixed"] = 0
                g["table_select"] = [bits.get(5), bits.get(5), bits.get(5)]
                g["subblock_gain"] = [0, 0, 0]
                g["region0_count"] = bits.get(4)
                g["region1_count"] = bits.get(3)
            # LSF has no preflag bit — it derives from scalefac_compress
            g["preflag"] = 0 if lsf else bits.get1()
            g["scalefac_scale"] = bits.get1()
            g["count1table_select"] = bits.get1()
            chs.append(g)
        si["gr"].append(chs)
    return si


def _read_scalefacs_lsf(bits: Bits, g: dict, i_stereo: bool = False) -> dict:
    """LSF (MPEG-2/2.5) scalefactors (ISO 13818-3 2.4.3.2): four groups of
    nr_of_sfb values at slen bits each, layout chosen by scalefac_compress
    category and block kind.  Sets g['preflag'] as a side effect.  The
    intensity-coded channel (i_stereo) uses the is_pos layout keyed by
    scalefac_compress >> 1."""
    short = g["window_switching"] and g["block_type"] == 2
    kind = (2 if g["mixed"] else 1) if short else 0
    if i_stereo:
        slen, nr = T.lsf_scalefac_layout_istereo(g["scalefac_compress"], kind)
        preflag = 0
    else:
        slen, nr, preflag = T.lsf_scalefac_layout(g["scalefac_compress"], kind)
    g["preflag"] = preflag
    sf_l = np.zeros(23, np.int32)
    sf_s = np.zeros((13, 3), np.int32)
    seq = []
    for k in range(4):
        for _ in range(nr[k]):
            seq.append(bits.get(slen[k]) if slen[k] else 0)
    i = 0
    if kind == 0:
        for sfb in range(21):
            sf_l[sfb] = seq[i]
            i += 1
    elif kind == 1:
        for sfb in range(12):
            for w in range(3):
                sf_s[sfb, w] = seq[i]
                i += 1
    else:
        for sfb in range(6):
            sf_l[sfb] = seq[i]
            i += 1
        for sfb in range(3, 12):
            for w in range(3):
                sf_s[sfb, w] = seq[i]
                i += 1
    return dict(l=sf_l, s=sf_s)


def _read_scalefacs(bits: Bits, g: dict, gr: int, scfsi, prev) -> dict:
    """Returns dict with 'l' [22] and 's' [13,3] scalefactors."""
    slen1 = int(T.SLEN1[g["scalefac_compress"]])
    slen2 = int(T.SLEN2[g["scalefac_compress"]])
    sf_l = np.zeros(23, np.int32)
    sf_s = np.zeros((13, 3), np.int32)
    short = g["window_switching"] and g["block_type"] == 2
    if short and not g["mixed"]:
        for sfb in range(6):
            for w in range(3):
                sf_s[sfb, w] = bits.get(slen1)
        for sfb in range(6, 12):
            for w in range(3):
                sf_s[sfb, w] = bits.get(slen2)
    elif short and g["mixed"]:
        for sfb in range(8):
            sf_l[sfb] = bits.get(slen1)
        for sfb in range(3, 6):
            for w in range(3):
                sf_s[sfb, w] = bits.get(slen1)
        for sfb in range(6, 12):
            for w in range(3):
                sf_s[sfb, w] = bits.get(slen2)
    else:
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
        for gi, (lo, hi, sl) in enumerate(groups):
            if gr == 1 and scfsi[gi]:
                sf_l[lo:hi] = prev["l"][lo:hi]
            else:
                for sfb in range(lo, hi):
                    sf_l[sfb] = bits.get(sl)
    return dict(l=sf_l, s=sf_s)


def _huffman_spectrum(bits: Bits, g: dict, sr: int, part2_start: int) -> np.ndarray:
    """Decode the 576-line quantized spectrum for one granule-channel."""
    is_ = np.zeros(576, np.int32)
    short = g["window_switching"] and g["block_type"] == 2
    if g["window_switching"]:
        region1 = T.ws_region1_lines(g.get("version", 3), g["block_type"], sr)
        region2 = 576
    else:
        bands = T.SFB_LONG[sr]
        region1 = int(bands[g["region0_count"] + 1])
        region2 = int(bands[min(g["region0_count"] + g["region1_count"] + 2, 22)])
    big = 2 * g["big_values"]
    idx = 0
    while idx < big:
        if bits.pos > part2_start + g["part2_3_length"]:
            raise ValueError("huffman overrun")  # ISO part2_3 bound
        region = 0 if idx < region1 else (1 if idx < region2 else 2)
        tsel = g["table_select"][region]
        tid, linbits = HT.TABLE_INFO[tsel]
        if tid < 0:
            raise ValueError("reserved huffman table")
        if tid == 0:
            x = y = 0
        else:
            x, y = _huff_decode(bits, _DEC_BIG[tid], _MAXLEN_BIG[tid])
            if x == 15 and linbits:
                x += bits.get(linbits)
            if x and bits.get1():
                x = -x
            if y == 15 and linbits:
                y += bits.get(linbits)
            if y and bits.get1():
                y = -y
        if idx < 576:
            is_[idx] = x
        if idx + 1 < 576:
            is_[idx + 1] = y
        idx += 2
    # count1 region
    dec = _DEC_C1[g["count1table_select"]]
    end = part2_start + g["part2_3_length"]
    while bits.pos < end and idx < 576:
        v = _huff_decode(bits, dec, 6)
        quad = [(v >> 3) & 1, (v >> 2) & 1, (v >> 1) & 1, v & 1]
        for q in quad:
            if idx >= 576:
                break
            if q:
                q = -q if bits.get1() else q
            is_[idx] = q
            idx += 1
    # Overshoot guard: a quad straddling the boundary is discarded.
    if bits.pos > end:
        is_[max(idx - 4, 0) : idx] = 0
    bits.pos = end
    return is_


def _requantize(is_: np.ndarray, g: dict, sf: dict, sr: int) -> np.ndarray:
    xr = np.zeros(576, np.float64)
    mag = np.abs(is_).astype(np.float64) ** (4.0 / 3.0)
    sign = np.sign(is_)
    gg = g["global_gain"] - 210
    sf_mult = 0.5 * (1 + g["scalefac_scale"])
    short = g["window_switching"] and g["block_type"] == 2
    long_bands = T.SFB_LONG[sr]
    short_bands = T.SFB_SHORT[sr]

    def long_range(sfb_lo, sfb_hi):
        for sfb in range(sfb_lo, sfb_hi):
            lo, hi = int(long_bands[sfb]), int(long_bands[sfb + 1])
            exp = 0.25 * gg - sf_mult * (
                sf["l"][sfb] + g["preflag"] * int(T.PRETAB[sfb])
            )
            xr[lo:hi] = sign[lo:hi] * mag[lo:hi] * 2.0 ** exp

    if not short:
        long_range(0, 22)
    else:
        if g["mixed"]:
            # mixed long region: 8 sfbs (MPEG-1) / 6 sfbs (LSF) — both end
            # at line 36
            long_range(0, g.get("n_long_mixed", 8))
            first_short_sfb = 3
        else:
            first_short_sfb = 0
        for sfb in range(first_short_sfb, 13):
            lo, hi = int(short_bands[sfb]), int(short_bands[sfb + 1])
            w_ = hi - lo
            for w in range(3):
                exp = 0.25 * (gg - 8 * g["subblock_gain"][w]) - sf_mult * sf["s"][
                    sfb, w
                ]
                a, b = lo * 3 + w * w_, lo * 3 + (w + 1) * w_
                xr[a:b] = sign[a:b] * mag[a:b] * 2.0 ** exp
    return xr


def _reorder(xr: np.ndarray, g: dict, sr: int) -> np.ndarray:
    """Short blocks: sfb-window-major order → line (subband) order."""
    if not (g["window_switching"] and g["block_type"] == 2):
        return xr
    out = xr.copy()
    short_bands = T.SFB_SHORT[sr]
    first = 3 if g["mixed"] else 0
    for sfb in range(first, 13):
        lo, hi = int(short_bands[sfb]), int(short_bands[sfb + 1])
        w_ = hi - lo
        base = lo * 3
        block = xr[base : base + 3 * w_].reshape(3, w_)  # [window, i]
        out[base : base + 3 * w_] = block.T.reshape(-1)  # [i, window]
    return out


def _stereo(xr_l, xr_r, g_l, g_r, sf_r, header, sr, lsf=False):
    """MS + intensity stereo (ISO 2.4.3.4.9 / 13818-3 2.4.3.4)."""
    if header["mode"] != 1:  # not joint stereo
        return xr_l, xr_r
    ms = bool(header["mode_ext"] & 2)
    intensity = bool(header["mode_ext"] & 1)
    L = xr_l.copy()
    R = xr_r.copy()
    isqrt2 = 1.0 / np.sqrt(2.0)
    if intensity:
        short = g_r["window_switching"] and g_r["block_type"] == 2
        long_bands = T.SFB_LONG[sr]
        short_bands = T.SFB_SHORT[sr]
        lsf_fac = (
            T.lsf_is_factors(g_r["scalefac_compress"] & 1) if lsf else None
        )

        def do_band(lo, hi, is_pos):
            sl = lo if hi is lo else slice(lo, hi)
            if is_pos == 7:
                if ms:
                    m, s = xr_l[sl], xr_r[sl]
                    L[sl] = (m + s) * isqrt2
                    R[sl] = (m - s) * isqrt2
            elif lsf:
                fl, fr = lsf_fac[min(is_pos, 31)]
                L[sl] = xr_l[sl] * fl
                R[sl] = xr_l[sl] * fr
            else:
                ratio = T.IS_RATIO[is_pos]
                L[sl] = xr_l[sl] * (ratio / (1 + ratio))
                R[sl] = xr_l[sl] * (1 / (1 + ratio))

        mixed = short and g_r["mixed"]
        if not short or mixed:
            # bound = first band fully above the right channel's last
            # nonzero line (GLOBAL: for mixed blocks any short-region
            # content pushes the bound past the whole long part —
            # pinned to mpg123, tests/test_intensity*.py)
            nz = np.nonzero(xr_r)[0]
            rzero = (int(nz[-1]) + 1) if len(nz) else 0
            n_long = (6 if lsf else 8) if mixed else 22
            bound_sfb = 21
            while bound_sfb > 0 and int(long_bands[bound_sfb]) >= rzero:
                bound_sfb -= 1
            bound_sfb += 1
            if rzero == 0:  # fully empty right: band 0 included
                bound_sfb = 0
            for sfb in range(min(bound_sfb, n_long), n_long):
                lo, hi = int(long_bands[sfb]), int(long_bands[sfb + 1])
                do_band(lo, hi, int(sf_r["l"][min(sfb, 20)]) if sfb < 21 else 7)
            bound_line = int(long_bands[min(bound_sfb, n_long)])
        if short:
            # short blocks: per-window bound at the band past the window's
            # last nonzero; segments are STRIDED in reordered line space
            # (validated against mpg123 via crafted streams); mixed blocks
            # only have short bands from sfb 3 (lines >= 36)
            first_sfb = 3 if mixed else 0
            for w in range(3):
                bound_w = 0
                for sfb in range(13):
                    lo, hi = int(short_bands[sfb]), int(short_bands[sfb + 1])
                    seg = np.arange(lo * 3 + w, hi * 3, 3)
                    if np.any(xr_r[seg]):
                        bound_w = sfb + 1
                for sfb in range(first_sfb, 13):
                    lo, hi = int(short_bands[sfb]), int(short_bands[sfb + 1])
                    seg = np.arange(lo * 3 + w, hi * 3, 3)
                    if sfb >= bound_w:
                        do_band(seg, seg, int(sf_r["s"][min(sfb, 11), w]))
                    elif ms:
                        m, s = xr_l[seg], xr_r[seg]
                        L[seg] = (m + s) * isqrt2
                        R[seg] = (m - s) * isqrt2
            if not mixed:
                return L, R
        if ms:
            m, s = xr_l[:bound_line], xr_r[:bound_line]
            L[:bound_line] = (m + s) * isqrt2
            R[:bound_line] = (m - s) * isqrt2
    elif ms:
        m, s = xr_l, xr_r
        L = (m + s) * isqrt2
        R = (m - s) * isqrt2
    return L, R


def _antialias(xr: np.ndarray, g: dict) -> np.ndarray:
    short = g["window_switching"] and g["block_type"] == 2
    if short and not g["mixed"]:
        return xr
    n_bound = 1 if (short and g["mixed"]) else 31
    out = xr.copy()
    for sb in range(1, n_bound + 1):
        for i in range(8):
            a = out[18 * sb - 1 - i]
            b = out[18 * sb + i]
            out[18 * sb - 1 - i] = a * T.AA_CS[i] - b * T.AA_CA[i]
            out[18 * sb + i] = b * T.AA_CS[i] + a * T.AA_CA[i]
    return out


def _imdct_granule(xr: np.ndarray, g: dict, overlap: np.ndarray) -> np.ndarray:
    """Hybrid IMDCT + overlap-add + frequency inversion.

    overlap: [32, 18] persistent state.  Returns time samples [32, 18].
    """
    short = g["window_switching"] and g["block_type"] == 2
    ts = np.zeros((32, 18))
    for sb in range(32):
        X = xr[sb * 18 : (sb + 1) * 18]
        if short and not (g["mixed"] and sb < 2):
            raw = np.zeros(36)
            for w in range(3):
                xw = X[w::3]  # reorder put line order [i*3 + w]
                raw[6 + 6 * w : 18 + 6 * w] += T.WIN_IMDCT12 @ xw
        else:
            bt = g["block_type"] if not (short and g["mixed"] and sb < 2) else (
                g["block_type"] if not short else 0
            )
            if short and g["mixed"] and sb < 2:
                bt = 0
            raw = T.WIN_IMDCT36[bt] @ X
        ts[sb] = raw[:18] + overlap[sb]
        overlap[sb] = raw[18:]
    # frequency inversion: odd subbands, odd time samples
    ts[1::2, 1::2] *= -1.0
    return ts


class _Synth:
    """Polyphase synthesis filterbank state (per channel)."""

    def __init__(self):
        self.v = np.zeros(1024)

    def run(self, ts: np.ndarray) -> np.ndarray:
        """ts [32, nt] → PCM [nt*32] (nt = 18 for Layer III granules;
        Layer I/II feed arbitrary step counts)."""
        nt = ts.shape[1]
        out = np.zeros((nt, 32))
        for t in range(nt):
            self.v = np.concatenate([T.SYNTH_N @ ts[:, t], self.v[:960]])
            u = np.zeros(512)
            for i in range(8):
                u[64 * i : 64 * i + 32] = self.v[128 * i : 128 * i + 32]
                u[64 * i + 32 : 64 * i + 64] = self.v[128 * i + 96 : 128 * i + 128]
            w = u * T.SYNTH_D
            out[t] = w.reshape(16, 32).sum(axis=0)
        return out.reshape(-1)


def decode(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode an MPEG Layer III stream (MPEG-1, -2 or -2.5) →
    (pcm [N, ch] f32, sample_rate)."""
    frames = find_frames(blob)
    frames = [(p, h) for p, h in frames if h["layer"] == 1]
    if not frames:
        raise ValueError("no Layer III frames")
    h0 = frames[0][1]
    sr, ch, ver = h0["sr"], h0["channels"], h0["version"]
    lsf = ver != 3
    ngr = 1 if lsf else 2
    reservoir = b""
    overlap = [np.zeros((32, 18)) for _ in range(ch)]
    synth = [_Synth() for _ in range(ch)]
    pcm = []
    for pos, h in frames:
        if h["sr"] != sr or h["channels"] != ch or h["version"] != ver:
            continue
        if lsf:
            side_len = 9 if ch == 1 else 17
        else:
            side_len = 17 if ch == 1 else 32
        off = pos + 4 + (2 if h["crc"] else 0)
        side = _read_side_info(Bits(blob[off : off + side_len]), ch, ver)
        main = blob[off + side_len : pos + h["frame_len"]]
        start = len(reservoir) - side["main_data_begin"]
        if start < 0:
            reservoir = (reservoir + main)[-4096:]
            pcm.append(np.zeros((576 * ngr, ch)))
            continue
        data = reservoir[start:] + main
        bits = Bits(data)
        prev_sf = [None] * ch
        frame_pcm = np.zeros((576 * ngr, ch))
        grx = [[None] * ch for _ in range(ngr)]
        sfx = [[None] * ch for _ in range(ngr)]
        for gr in range(ngr):
            for c in range(ch):
                g = side["gr"][gr][c]
                g["version"] = ver
                if lsf:
                    g["n_long_mixed"] = 6
                part2_start = bits.pos
                if lsf:
                    i_st = (
                        c == 1 and h["mode"] == 1 and bool(h["mode_ext"] & 1)
                    )
                    sf = _read_scalefacs_lsf(bits, g, i_stereo=i_st)
                else:
                    sf = _read_scalefacs(bits, g, gr, side["scfsi"][c], prev_sf[c])
                prev_sf[c] = sf
                is_ = _huffman_spectrum(bits, g, sr, part2_start)
                xr = _requantize(is_, g, sf, sr)
                xr = _reorder(xr, g, sr)
                grx[gr][c] = xr
                sfx[gr][c] = sf
            chans = grx[gr]
            if ch == 2:
                l, r = _stereo(
                    chans[0], chans[1], side["gr"][gr][0], side["gr"][gr][1],
                    sfx[gr][1], h, sr, lsf=lsf,
                )
                chans = [l, r]
            for c in range(ch):
                xr = _antialias(chans[c], side["gr"][gr][c])
                ts = _imdct_granule(xr, side["gr"][gr][c], overlap[c])
                frame_pcm[gr * 576 : (gr + 1) * 576, c] = synth[c].run(ts)
        pcm.append(frame_pcm)
        reservoir = (reservoir + main)[-4096:]
    return np.concatenate(pcm).astype(np.float32), sr
