"""Minimal MPEG Layer III bitstream WRITER for conformance probing.

Emits spec-valid single-purpose frames with exact control over side info,
scalefactors and spectra — the tool that lets tests interrogate a
reference decoder's behavior band by band (e.g. intensity-stereo
semantics, where the spec is ambiguous and real decoders diverge).

Only what the probes need is supported: MPEG-1 and LSF headers, long or
short blocks, spectra encoded with Huffman table 1 (values in {-1,0,1})
over the big-values region, no count1 region, no reservoir
(main_data_begin = 0, all data in-frame).
"""

from __future__ import annotations

import numpy as np

from audio_decoder_tpu.codecs.mpeg import huffman_tables as HT
from audio_decoder_tpu.codecs.mpeg import tables as T


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, v: int, n: int):
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def bytes(self, pad_to: int | None = None) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | (self.bits[i + j] if i + j < len(self.bits) else 0)
            out.append(b)
        if pad_to is not None:
            assert len(out) <= pad_to, (len(out), pad_to)
            out.extend(b"\x00" * (pad_to - len(out)))
        return bytes(out)


def _encode_big_pairs(w: BitWriter, values: np.ndarray) -> int:
    """Encode values (in {-1,0,1}, even count) with table 1; returns
    big_values (pair count)."""
    assert len(values) % 2 == 0
    table = HT.BIG_TABLES[1]
    for i in range(0, len(values), 2):
        x, y = int(values[i]), int(values[i + 1])
        length, code = table[(abs(x), abs(y))]
        w.put(code, length)
        if x:
            w.put(1 if x < 0 else 0, 1)
        if y:
            w.put(1 if y < 0 else 0, 1)
    return len(values) // 2


def make_l3_frame(
    sr: int = 44100,
    mode: int = 1,
    mode_ext: int = 1,
    spectra=((), ()),
    scalefac: tuple = ((), ()),
    scalefac_compress: tuple = (0, 0),
    block_type: tuple = (0, 0),
    global_gain: tuple = (210, 210),
    bitrate_idx: int = 12,
    bv_override: tuple = (None, None),
    table_select: tuple = (1, 1),
    sf_pad_bits: tuple = (0, 0),
    mixed: tuple = (0, 0),
    protect: bool = False,
    scfsi: tuple = (0, 0),
) -> bytes:
    """One self-contained frame (plus everything zero after big values).

    spectra[ch]: int array of even length, values in {-1, 0, 1} — becomes
    the leading spectral lines of every granule of that channel.
    scalefac[ch]: long-block scalefactor list (MPEG-1: 21 entries read at
    slen from scalefac_compress; LSF: 21 entries; LSF intensity channel
    uses the is_pos layout automatically when mode_ext & 1).
    bv_override[ch]: force big_values without emitting bits (use with
    table_select[ch] = 0, whose codewords are zero-length — e.g. bv=288 +
    table 0 makes the count1 region empty so trailing slack bits are
    inert).  sf_pad_bits[ch]: extra zero bits appended after the
    scalefactors (inside part2_3_length).
    """
    version = 3 if sr in (44100, 48000, 32000) else (
        2 if sr in (22050, 24000, 16000) else 0)
    lsf = version != 3
    sr_idx = {44100: 0, 48000: 1, 32000: 2, 22050: 0, 24000: 1, 16000: 2,
              11025: 0, 12000: 1, 8000: 2}[sr]
    ch = 1 if mode == 3 else 2
    ngr = 1 if lsf else 2

    # --- per-channel granule payload (scalefactors + huffman bits) ---
    def granule_bits(c: int, gr: int) -> tuple[BitWriter, int, int]:
        w = BitWriter()
        sfs = list(scalefac[c]) if c < len(scalefac) else []
        sc = scalefac_compress[c]
        short = block_type[c] == 2
        if lsf:
            kind = (2 if mixed[c] else 1) if short else 0
            if c == 1 and mode == 1 and (mode_ext & 1):
                slen, nr = T.lsf_scalefac_layout_istereo(sc, kind)
            else:
                slen, nr, _pre = T.lsf_scalefac_layout(sc, kind)
            seq = (sfs + [0] * 40)[: sum(nr)]
            k = 0
            for g_i in range(4):
                for _ in range(nr[g_i]):
                    if slen[g_i]:
                        w.put(seq[k], slen[g_i])
                    k += 1
        elif short and mixed[c]:
            # 8 long at slen1, then sfb 3-5 windows at slen1, 6-11 at slen2
            slen1, slen2 = int(T.SLEN1[sc]), int(T.SLEN2[sc])
            seq = (sfs + [0] * 35)[:35]
            for k in range(17):  # 8 long + 9 short(3..5)
                if slen1:
                    w.put(seq[k], slen1)
            for k in range(17, 35):
                if slen2:
                    w.put(seq[k], slen2)
        elif short:
            # 36 values, sfb-major window-minor: sfb 0-5 at slen1, 6-11 slen2
            slen1, slen2 = int(T.SLEN1[sc]), int(T.SLEN2[sc])
            seq = (sfs + [0] * 36)[:36]
            for k in range(18):
                if slen1:
                    w.put(seq[k], slen1)
            for k in range(18, 36):
                if slen2:
                    w.put(seq[k], slen2)
        else:
            # scfsi groups (0-5, 6-10, 11-15, 16-20): granule 1 reuses
            # granule 0's scalefactors for flagged groups (ISO 2.4.2.7)
            slen1, slen2 = int(T.SLEN1[sc]), int(T.SLEN2[sc])
            seq = (sfs + [0] * 21)[:21]
            groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
                      (16, 21, slen2)]
            for g_i, (lo, hi, sl) in enumerate(groups):
                if gr == 1 and (scfsi[c] >> (3 - g_i)) & 1:
                    continue
                for sfb in range(lo, hi):
                    if sl:
                        w.put(seq[sfb], sl)
        vals = np.asarray(spectra[c] if c < len(spectra) else [], np.int32)
        if bv_override[c] is not None:
            assert len(vals) == 0 and table_select[c] == 0
            bv = bv_override[c]
        else:
            bv = _encode_big_pairs(w, vals)
        for _ in range(sf_pad_bits[c]):  # slack after the Huffman data
            w.put(0, 1)
        return w, bv, len(w.bits)

    payload = BitWriter()
    side_fields = []
    for gr in range(ngr):
        for c in range(ch):
            w, bv, nbits = granule_bits(c, gr)
            payload.bits.extend(w.bits)
            side_fields.append((nbits, bv, c))

    # --- side info ---
    side = BitWriter()
    side.put(0, 8 if lsf else 9)  # main_data_begin = 0
    side.put(0, (1 if ch == 1 else 2) if lsf else (5 if ch == 1 else 3))
    if not lsf:
        for _c in range(ch):
            side.put(scfsi[_c], 4)
    fi = 0
    for gr in range(ngr):
        for c in range(ch):
            nbits, bv, _ = side_fields[fi]
            fi += 1
            side.put(nbits, 12)  # part2_3_length
            side.put(bv, 9)
            side.put(global_gain[c], 8)
            side.put(scalefac_compress[c], 9 if lsf else 4)
            bt = block_type[c]
            ts = table_select[c]
            if bt == 0:
                side.put(0, 1)  # no window switching
                side.put(ts, 5)  # table_select (all regions)
                side.put(ts, 5)
                side.put(ts, 5)
                side.put(0, 4)  # region0_count
                side.put(0, 3)  # region1_count
            else:
                side.put(1, 1)
                side.put(bt, 2)
                side.put(mixed[c], 1)
                side.put(ts, 5)
                side.put(ts, 5)
                for _ in range(3):
                    side.put(0, 3)  # subblock_gain
            if not lsf:
                side.put(0, 1)  # preflag
            side.put(0, 1)  # scalefac_scale
            side.put(0, 1)  # count1table_select

    # --- header + assembly ---
    layer_code = 1  # Layer III
    hdr = ((0x7FF << 21) | (version << 19) | (layer_code << 17)
           | ((0 if protect else 1) << 16)
           | (bitrate_idx << 12) | (sr_idx << 10) | (0 << 9) | (0 << 8)
           | (mode << 6) | (mode_ext << 4))
    from audio_decoder_tpu.codecs.mpeg.frontend import crc16, parse_header

    h = parse_header(hdr)
    assert h is not None and h["frame_len"] > 0
    side_b = side.bytes(17 if (not lsf and ch == 1) else (
        32 if not lsf else (9 if ch == 1 else 17)))
    hdr_b = int(hdr).to_bytes(4, "big")
    crc_b = (
        crc16(hdr_b[2:4] + side_b).to_bytes(2, "big") if protect else b""
    )
    main_b = payload.bytes(h["frame_len"] - 4 - len(crc_b) - len(side_b))
    out = hdr_b + crc_b + side_b + main_b
    assert len(out) == h["frame_len"]
    return out
