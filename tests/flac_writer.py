"""Clear-room FLAC encoder for conformance-test stream generation.

Written from the public FLAC specification (RFC 9639) — the test-side
bitstream generator for the round-3 device FLAC family, in the same
role tests/mp3_writer.py plays for MPEG: craft streams with EXACTLY
chosen coding features (subframe types, fixed/LPC orders, rice
partition layouts, stereo decorrelation modes, wasted bits, escapes) so
each decoder path can be pinned in isolation.  Compression quality is
irrelevant; correctness of the emitted bitstream is the contract
(validated against libavcodec in tests/test_flac_oracle.py and against
tests/flac_ref.py).
"""

from __future__ import annotations

import struct

import hashlib

import numpy as np

from .flac_ref import FIXED_COEFFS, crc8, crc16


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def u(self, val: int, n: int) -> None:
        assert 0 <= val < (1 << n), (val, n)
        self.acc = (self.acc << n) | val
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def s(self, val: int, n: int) -> None:
        assert -(1 << (n - 1)) <= val < (1 << (n - 1)), (val, n)
        self.u(val & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.u(0, 32)
            q -= 32
        self.u(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.u(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(w: BitWriter, val: int) -> None:
    if val < 0x80:
        w.u(val, 8)
        return
    # n = continuation bytes; payload capacity is 6 + 5n bits
    for n in range(1, 7):
        if val < (1 << (6 + 5 * n)):
            break
    lead = 0
    for _ in range(n + 1):
        lead = (lead << 1) | 1
    lead <<= 7 - n
    w.u(lead | (val >> (6 * n)), 8)
    for k in range(n - 1, -1, -1):
        w.u(0x80 | ((val >> (6 * k)) & 0x3F), 8)


def _best_rice_param(res: np.ndarray, maxp: int) -> int:
    best, bestp = None, 0
    zz = (np.abs(res.astype(np.int64)) << 1) - (res < 0)
    for p in range(maxp + 1):
        cost = int(np.sum(zz >> p)) + len(res) * (p + 1)
        if best is None or cost < best:
            best, bestp = cost, p
    return bestp


def _write_residual(
    w: BitWriter, res: np.ndarray, blocksize: int, order: int,
    *, partition_order: int = 0, method: int = 0,
    force_param: int | None = None, escape_bits: int | None = None,
) -> None:
    pbits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    # a (last, partial) frame may not honor the requested partitioning:
    # fall back until the layout divides and partition 0 is non-empty
    while partition_order and (
        blocksize % (1 << partition_order)
        or blocksize // (1 << partition_order) <= order
    ):
        partition_order -= 1
    w.u(method, 2)
    w.u(partition_order, 4)
    npart = 1 << partition_order
    assert blocksize % npart == 0
    idx = 0
    for p in range(npart):
        cnt = blocksize // npart - (order if p == 0 else 0)
        part = res[idx : idx + cnt]
        idx += cnt
        if escape_bits is not None:
            w.u(escape, pbits)
            w.u(escape_bits, 5)
            for v in part:
                w.s(int(v), escape_bits)
            continue
        param = (force_param if force_param is not None
                 else _best_rice_param(part, escape - 1))
        param = min(param, escape - 1)
        w.u(param, pbits)
        for v in part:
            zz = (-int(v) << 1) - 1 if v < 0 else int(v) << 1
            w.unary(zz >> param)
            if param:
                w.u(zz & ((1 << param) - 1), param)
    assert idx == len(res)


def _write_subframe(
    w: BitWriter, x: np.ndarray, bps: int, *, kind: str = "auto",
    order: int = 2, lpc_coefs=None, lpc_shift: int = 0,
    lpc_precision: int = 12, wasted: int = 0, **res_kw,
) -> None:
    # reduce to the trailing-zero count the channel actually has (a
    # derived channel — e.g. mid — keeps fewer than the source channels)
    while wasted and np.any(x.astype(np.int64) & ((1 << wasted) - 1)):
        wasted -= 1
    if wasted:
        x = x >> wasted
        bps -= wasted
    x = x.astype(np.int64)
    if kind == "auto":
        if np.all(x == x[0]):
            kind = "constant"
        else:
            kind = "fixed"
    # a (last, short) frame may be smaller than the predictor order —
    # there is no room for warmup + residual, store it verbatim
    if kind == "fixed" and len(x) <= order:
        kind = "verbatim"
    if kind == "lpc" and len(x) <= len(lpc_coefs):
        kind = "verbatim"
    # a requested CONSTANT only applies when the block really is one
    # (the choice a real encoder makes); otherwise store verbatim
    if kind == "constant" and not np.all(x == x[0]):
        kind = "verbatim"
    w.u(0, 1)  # reserved
    if kind == "constant":
        w.u(0, 6)
        _write_wasted(w, wasted)
        w.s(int(x[0]), bps)
        return
    if kind == "verbatim":
        w.u(1, 6)
        _write_wasted(w, wasted)
        for v in x:
            w.s(int(v), bps)
        return
    if kind == "fixed":
        coef = FIXED_COEFFS[order]
        w.u(8 | order, 6)
        _write_wasted(w, wasted)
        for v in x[:order]:
            w.s(int(v), bps)
        res = x[order:].copy()
        for j, c in enumerate(coef):
            res -= c * x[order - 1 - j : len(x) - 1 - j]
        _write_residual(w, res, len(x), order, **res_kw)
        return
    if kind == "lpc":
        coefs = [int(c) for c in lpc_coefs]
        o = len(coefs)
        w.u(32 | (o - 1), 6)
        _write_wasted(w, wasted)
        for v in x[:o]:
            w.s(int(v), bps)
        w.u(lpc_precision - 1, 4)
        w.s(lpc_shift, 5)
        for c in coefs:
            assert -(1 << (lpc_precision - 1)) <= c < (1 << (lpc_precision - 1))
            w.s(c, lpc_precision)
        res = np.empty(len(x) - o, np.int64)
        for i in range(o, len(x)):
            pred = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
            res[i - o] = int(x[i]) - (pred >> lpc_shift)
        _write_residual(w, res, len(x), o, **res_kw)
        return
    raise ValueError(kind)


def _write_wasted(w: BitWriter, wasted: int) -> None:
    if wasted:
        w.u(1, 1)
        w.unary(wasted - 1)
    else:
        w.u(0, 1)


BLOCKSIZE_TO_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                     256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                     8192: 13, 16384: 14, 32768: 15}
RATE_TO_CODE = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                96000: 11}
BPS_TO_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def encode_frame(
    samples: np.ndarray,  # int [n, channels]
    frame_no: int,
    rate: int,
    bps: int,
    *,
    stereo: str = "independent",  # independent|left_side|right_side|mid_side
    subframe_kw: dict | None = None,
) -> bytes:
    n, ch = samples.shape
    kw = subframe_kw or {}
    w = BitWriter()
    w.u(0x3FFE, 14)
    w.u(0, 1)
    w.u(0, 1)  # fixed blocksize strategy
    bs_code = BLOCKSIZE_TO_CODE.get(n, 7)
    w.u(bs_code, 4)
    w.u(RATE_TO_CODE.get(rate, 0), 4)
    if stereo == "independent":
        ch_code = ch - 1
    else:
        assert ch == 2
        ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo]
    w.u(ch_code, 4)
    # sizes without a 3-bit code (e.g. 26/28) use 0 = "from STREAMINFO"
    w.u(BPS_TO_CODE.get(bps, 0), 3)
    w.u(0, 1)
    _utf8_number(w, frame_no)
    if bs_code == 7:
        w.u(n - 1, 16)
    w.align()
    hdr = w.bytes()
    w2 = BitWriter()
    w2.buf = bytearray(hdr)
    w2.u(crc8(hdr), 8)

    s = samples.astype(np.int64)
    if stereo == "independent":
        for c in range(ch):
            _write_subframe(w2, s[:, c], bps, **kw)
    elif stereo == "left_side":
        _write_subframe(w2, s[:, 0], bps, **kw)
        _write_subframe(w2, s[:, 0] - s[:, 1], bps + 1, **kw)
    elif stereo == "right_side":
        _write_subframe(w2, s[:, 0] - s[:, 1], bps + 1, **kw)
        _write_subframe(w2, s[:, 1], bps, **kw)
    else:  # mid_side
        _write_subframe(w2, (s[:, 0] + s[:, 1]) >> 1, bps, **kw)
        _write_subframe(w2, s[:, 0] - s[:, 1], bps + 1, **kw)
    w2.align()
    body = w2.bytes()
    w3 = BitWriter()
    w3.buf = bytearray(body)
    w3.u(crc16(body), 16)
    return w3.bytes()


def encode_file(
    pcm: np.ndarray,  # int [S, C]
    rate: int = 44100,
    bps: int = 16,
    *,
    blocksize: int = 1024,
    stereo: str = "independent",
    subframe_kw: dict | list | None = None,
) -> bytes:
    """Full FLAC stream: fLaC magic + STREAMINFO + frames.

    ``subframe_kw``: one dict for every frame, or a LIST of dicts
    cycled per frame — real streams mix subframe kinds, and the device
    decoder must handle a different layout in every lane."""
    S, C = pcm.shape
    nframes = (S + blocksize - 1) // blocksize
    frames = []
    for k in range(nframes):
        blk = pcm[k * blocksize : (k + 1) * blocksize]
        kw = (subframe_kw[k % len(subframe_kw)]
              if isinstance(subframe_kw, list) else subframe_kw)
        frames.append(encode_frame(
            blk, k, rate, bps, stereo=stereo if blk.shape[1] == 2 else
            "independent", subframe_kw=kw))
    payload = b"".join(frames)
    si = BitWriter()
    si.u(blocksize, 16)
    si.u(blocksize, 16)
    si.u(0, 24)
    si.u(0, 24)
    si.u(rate, 20)
    si.u(C - 1, 3)
    si.u(bps - 1, 5)
    si.u(S, 36)
    # STREAMINFO MD5: unencoded samples, interleaved, little-endian,
    # ceil(bps/8) bytes each (little-endian i64 truncation = two's
    # complement in the container width)
    nb = (bps + 7) // 8
    raw = np.ascontiguousarray(pcm.astype("<i8")).view(np.uint8)
    md5 = hashlib.md5(raw.reshape(-1, 8)[:, :nb].tobytes()).digest()
    info = si.bytes() + md5
    hdr = b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info
    return hdr + payload
