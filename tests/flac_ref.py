"""Clear-room pure-Python/NumPy FLAC decoder — reference oracle.

Implements the FLAC format from the public specification (RFC 9639 /
xiph.org format docs), written from the spec text — NOT ported from any
decoder.  Scope: STREAMINFO + frames with CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (any order) subframes, all four channel assignments
(independent, left/side, right/side, mid/side), rice and rice2 residual
coding with escape partitions, wasted bits, 8/16/24-bit sample sizes,
CRC-8 and CRC-16 verification.

This is the ROUND-3 FOUNDATION for a device FLAC family (ROADMAP round-3
item 1): together with tests/flac_writer.py it gives the same dual-sided
oracle the ADPCM families used, cross-checked against libavcodec
(tests/codec_refs.py ffdec shim) in tests/test_flac_oracle.py.
"""

from __future__ import annotations

import struct

import numpy as np

FIXED_COEFFS = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]

BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
              6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
              11: 96000}


def crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x^1+1 (0x07), init 0 (frame-header CRC)."""
    r = 0
    for b in data:
        r ^= b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
    return r


def crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 (frame CRC)."""
    r = 0
    for b in data:
        r ^= b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 else (r << 1) & 0xFFFF
    return r


class Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.u(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def read_utf8_number(bits: Bits) -> int:
    """The UTF-8-style variable-length coded frame/sample number."""
    b0 = bits.u(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    val = b0 & (mask - 1)
    for _ in range(n):
        val = (val << 6) | (bits.u(8) & 0x3F)
    return val


def parse_streaminfo(blob: bytes) -> dict:
    if blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        hdr = blob[pos : pos + 4]
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        size = int.from_bytes(hdr[1:4], "big")
        if btype == 0:
            b = Bits(blob[pos + 4 : pos + 4 + size])
            info = dict(
                min_block=b.u(16), max_block=b.u(16),
                min_frame=b.u(24), max_frame=b.u(24),
                rate=b.u(20), channels=b.u(3) + 1, bits=b.u(5) + 1,
                total=b.u(36),
            )
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("no STREAMINFO")
    info["frames_start"] = pos
    return info


def _decode_subframe(bits: Bits, n: int, bps: int) -> np.ndarray:
    if bits.u(1) != 0:
        raise ValueError("subframe reserved bit set")
    ftype = bits.u(6)
    wasted = 0
    if bits.u(1):  # wasted-bits flag
        wasted = bits.unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        out = np.full(n, bits.s(bps), np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.asarray([bits.s(bps) for _ in range(n)], np.int64)
    elif 8 <= ftype <= 12:  # FIXED, order = ftype & 7
        order = ftype & 7
        warm = [bits.s(bps) for _ in range(order)]
        res = _decode_residual(bits, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        coef = FIXED_COEFFS[order]
        for i in range(order, n):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coef))
            out[i] = res[i - order] + pred
    elif ftype >= 32:  # LPC, order = (ftype & 31) + 1
        order = (ftype & 31) + 1
        warm = [bits.s(bps) for _ in range(order)]
        prec = bits.u(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = bits.s(5)
        coefs = [bits.s(prec) for _ in range(order)]
        res = _decode_residual(bits, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        for i in range(order, n):
            pred = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs))
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    return out << wasted


def _decode_residual(bits: Bits, n: int, order: int) -> np.ndarray:
    method = bits.u(2)
    if method not in (0, 1):
        raise ValueError("reserved residual method")
    pbits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    po = bits.u(4)
    npart = 1 << po
    if n % npart:
        raise ValueError("blocksize not divisible by partition count")
    out = []
    for p in range(npart):
        cnt = n // npart - (order if p == 0 else 0)
        param = bits.u(pbits)
        if param == escape:
            raw = bits.u(5)
            out.extend(bits.s(raw) if raw else 0 for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = bits.unary()
                v = (q << param) | bits.u(param) if param else q
                out.append((v >> 1) ^ -(v & 1))  # unzigzag
    return np.asarray(out, np.int64)


def decode_frame(blob: bytes, pos: int, info: dict):
    """Decode one frame at byte offset ``pos``.  Returns
    (samples int32 [n, channels], next_pos)."""
    bits = Bits(blob, pos * 8)
    if bits.u(14) != 0x3FFE:
        raise ValueError(f"no sync at {pos}")
    if bits.u(1) != 0:
        raise ValueError("reserved header bit")
    bits.u(1)  # blocking strategy
    bs_code = bits.u(4)
    rate_code = bits.u(4)
    ch_code = bits.u(4)
    ss_code = bits.u(3)
    if bits.u(1) != 0:
        raise ValueError("reserved header bit 2")
    read_utf8_number(bits)
    if bs_code == 0:
        raise ValueError("reserved blocksize code")
    elif bs_code == 6:
        n = bits.u(8) + 1
    elif bs_code == 7:
        n = bits.u(16) + 1
    else:
        n = BLOCKSIZE_CODES[bs_code]
    if rate_code == 12:
        bits.u(8)
    elif rate_code in (13, 14):
        bits.u(16)
    bps = info["bits"] if ss_code == 0 else SAMPLE_SIZE_CODES[ss_code]
    hdr_end = bits.pos >> 3
    if crc8(blob[pos:hdr_end]) != bits.u(8):
        raise ValueError("frame header CRC-8 mismatch")

    if ch_code <= 7:
        chans = [_decode_subframe(bits, n, bps) for _ in range(ch_code + 1)]
        out = np.stack(chans, axis=1)
    else:
        # stereo decorrelation: the side channel carries one extra bit
        if ch_code == 8:  # left/side
            left = _decode_subframe(bits, n, bps)
            side = _decode_subframe(bits, n, bps + 1)
            out = np.stack([left, left - side], axis=1)
        elif ch_code == 9:  # right/side (side first)
            side = _decode_subframe(bits, n, bps + 1)
            right = _decode_subframe(bits, n, bps)
            out = np.stack([right + side, right], axis=1)
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(bits, n, bps)
            side = _decode_subframe(bits, n, bps + 1)
            m2 = (mid << 1) | (side & 1)
            out = np.stack([(m2 + side) >> 1, (m2 - side) >> 1], axis=1)
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
    bits.align()
    body_end = bits.pos >> 3
    if crc16(blob[pos:body_end]) != bits.u(16):
        raise ValueError("frame CRC-16 mismatch")
    return out.astype(np.int32), bits.pos >> 3


def decode_file(blob: bytes) -> tuple[np.ndarray, dict]:
    """Decode a whole FLAC stream.  Returns (int32 [S, C], streaminfo)."""
    info = parse_streaminfo(blob)
    pos = info["frames_start"]
    chunks = []
    total = 0
    while pos < len(blob) and (info["total"] == 0 or total < info["total"]):
        samples, pos = decode_frame(blob, pos, info)
        chunks.append(samples)
        total += samples.shape[0]
    out = np.concatenate(chunks, axis=0) if chunks else (
        np.zeros((0, info["channels"]), np.int32))
    if info["total"]:
        out = out[: info["total"]]
    return out, info
