"""Independent NumPy decode oracle.

Re-implements the *intended* semantics of the reference parsers
(blast/src/file_parsing/wav.rs:69-167, aiff.rs:99-183) in plain sequential
NumPy — a deliberately different implementation style from the device code —
so the batched TPU decoders can be checked bit-exactly against it
(SURVEY §4 strategy (a)).  Known reference defects (SURVEY §5) are *not*
reproduced: the extensible skip is 14 bytes, all declared bit depths decode,
unknown chunks are walked.
"""

from __future__ import annotations

import struct

import numpy as np


class OracleError(Exception):
    def __init__(self, kind: str, msg: str = ""):
        super().__init__(f"{kind}: {msg}")
        self.kind = kind  # "UnexpectedEof" | "UnsupportedFormat" | "InvalidData"


def _need(blob: bytes, start: int, n: int) -> bytes:
    if start + n > len(blob):
        raise OracleError("UnexpectedEof", f"need {n} bytes at {start}")
    return blob[start : start + n]


def _unpack_samples(data: bytes, bits: int, channels: int, *, big_endian: bool,
                    unsigned8: bool, float32: bool,
                    float64: bool = False) -> np.ndarray:
    bps = bits // 8
    n_frames = len(data) // (bps * channels)
    data = data[: n_frames * bps * channels]
    if float64:
        flat = np.frombuffer(data, ">f8" if big_endian else "<f8").astype(np.float32)
    elif float32:
        flat = np.frombuffer(data, ">f4" if big_endian else "<f4").astype(np.float32)
    elif bits == 8:
        raw = np.frombuffer(data, np.uint8).astype(np.int32)
        flat = ((raw - 128) if unsigned8 else np.where(raw >= 128, raw - 256, raw))
        flat = flat.astype(np.float32) / 128.0
    elif bits == 16:
        flat = np.frombuffer(data, ">i2" if big_endian else "<i2").astype(np.float32)
        flat /= 32768.0
    elif bits == 24:
        b = np.frombuffer(data, np.uint8).reshape(-1, 3).astype(np.int32)
        val = (b[:, 0] << 16 | b[:, 1] << 8 | b[:, 2]) if big_endian else (
            b[:, 2] << 16 | b[:, 1] << 8 | b[:, 0]
        )
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        flat = val.astype(np.float32) / float(1 << 23)
    elif bits == 32:
        flat = np.frombuffer(data, ">i4" if big_endian else "<i4").astype(np.float32)
        flat /= float(1 << 31)
    else:
        raise OracleError("UnsupportedFormat", f"{bits}-bit")
    return flat.reshape(n_frames, channels)


def parse_wav(blob: bytes) -> dict:
    if len(blob) < 12 or blob[0:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise OracleError("UnsupportedFormat", "not RIFF/WAVE")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob) and data is None:
        cid = blob[pos : pos + 4]
        (csize,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        payload = pos + 8
        if cid == b"fmt ":
            fmt = _need(blob, payload, min(csize, 16))
            fmt_full = blob[payload : payload + csize]
        elif cid == b"data":
            data = _need(blob, payload, csize)
        pos = payload + csize + (csize & 1)
    if fmt is None or data is None:
        raise OracleError("UnexpectedEof", "missing fmt/data chunk")
    fmt_code, channels, rate, _byte_rate, _block, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if fmt_code == 0xFFFE and len(fmt_full) >= 26:
        (cb,) = struct.unpack("<H", fmt_full[16:18])
        if cb >= 22:
            (fmt_code,) = struct.unpack("<H", fmt_full[24:26])
    float32 = float64 = False
    if fmt_code == 1 and bits in (8, 16, 24, 32):
        pass
    elif fmt_code == 3 and bits == 32:
        float32 = True
    elif fmt_code == 3 and bits == 64:
        float64 = True
    else:
        raise OracleError("UnsupportedFormat", f"fmt {fmt_code} bits {bits}")
    if channels <= 0:
        raise OracleError("InvalidData", "no channels")
    pcm = _unpack_samples(
        data, bits, channels, big_endian=False, unsigned8=bits == 8,
        float32=float32, float64=float64,
    )
    return dict(sample_rate=rate, channels=channels, bits=bits, pcm=pcm)


def parse_aiff(blob: bytes) -> dict:
    if len(blob) < 12 or blob[0:4] != b"FORM" or blob[8:12] != b"AIFF":
        raise OracleError("UnsupportedFormat", "not FORM/AIFF")
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= len(blob) and (comm is None or ssnd is None):
        cid = blob[pos : pos + 4]
        (csize,) = struct.unpack(">I", blob[pos + 4 : pos + 8])
        payload = pos + 8
        if cid == b"COMM":
            if csize != 18:  # ≙ aiff.rs:122-126
                raise OracleError("InvalidData", "Comm size should be 18")
            comm = _need(blob, payload, 18)
        elif cid == b"SSND":
            ssnd = _need(blob, payload, csize)
        pos = payload + csize + (csize & 1)
    if comm is None or ssnd is None:
        raise OracleError("UnexpectedEof", "missing COMM/SSND")
    channels, n_frames, bits = struct.unpack(">hIh", comm[:8])
    rate = _parse_ieee_extended(comm[8:18])
    if bits not in (8, 16, 24, 32):
        raise OracleError("UnsupportedFormat", f"{bits}-bit")
    if channels <= 0 or rate <= 0:
        raise OracleError("InvalidData", "bad geometry")
    offset, _block = struct.unpack(">II", ssnd[:8])
    data = ssnd[8 + offset :]
    pcm = _unpack_samples(
        data, bits, channels, big_endian=True, unsigned8=False, float32=False
    )[: int(n_frames)]
    return dict(sample_rate=int(round(rate)), channels=channels, bits=bits, pcm=pcm)


def _parse_ieee_extended(b: bytes) -> float:
    """Scalar IEEE-80 decode (≙ aiff.rs:51-94)."""
    sign = -1.0 if b[0] & 0x80 else 1.0
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        return float("nan")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def consensus(rates: list[int], channel_counts: list[int]) -> tuple[int, int]:
    """Consensus config: most frequent sample rate (first-seen tiebreak,
    ≙ main.rs:91-105) and max channels (≙ main.rs:107-120); defaults
    44100 / 2 when empty."""
    if not rates:
        return 44100, 2
    counts: dict[int, int] = {}
    for r in rates:
        counts[r] = counts.get(r, 0) + 1
    best = max(counts.items(), key=lambda kv: kv[1])[1]
    rate = next(r for r in rates if counts[r] == best)
    return rate, (max(channel_counts) if channel_counts else 2)
