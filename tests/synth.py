"""Byte-level WAV/AIFF synthesizers for golden-file tests.

The reference's own tests depended on gitignored real assets
(blast/src/lib.rs:7-35, .gitignore:7) and so never ran; here every test
synthesizes its files from scratch (SURVEY §4 strategy (a)).
"""

from __future__ import annotations

import struct

import numpy as np


def _pack_ieee_extended(rate: float) -> bytes:
    """Encode an IEEE 754 80-bit extended float (AIFF sample rate)."""
    if rate == 0:
        return b"\x00" * 10
    sign = 0
    if rate < 0:
        sign = 0x8000
        rate = -rate
    mant, exp = np.frexp(rate)  # rate = mant * 2**exp, mant in [0.5, 1)
    exp = int(exp) + 16382
    mant_int = int(mant * (1 << 64))
    return struct.pack(">H", sign | exp) + struct.pack(">Q", mant_int)


def pcm_to_bytes(pcm: np.ndarray, bits: int, *, big_endian: bool,
                 unsigned8: bool = False, float32: bool = False,
                 float64: bool = False) -> bytes:
    """Interleave a [frames, channels] int array (or float array for
    float32/float64) into raw sample bytes."""
    flat = pcm.reshape(-1)
    if float64:
        return flat.astype(">f8" if big_endian else "<f8").tobytes()
    if float32:
        return flat.astype(">f4" if big_endian else "<f4").tobytes()
    if bits == 8:
        if unsigned8:
            return (flat.astype(np.int16) + 128).astype(np.uint8).tobytes()
        return flat.astype(np.int8).tobytes()
    if bits == 16:
        return flat.astype(">i2" if big_endian else "<i2").tobytes()
    if bits == 24:
        as32 = flat.astype(np.int64)
        as32 = np.where(as32 < 0, as32 + (1 << 24), as32).astype(np.uint32)
        b0 = (as32 & 0xFF).astype(np.uint8)
        b1 = ((as32 >> 8) & 0xFF).astype(np.uint8)
        b2 = ((as32 >> 16) & 0xFF).astype(np.uint8)
        trip = (b2, b1, b0) if big_endian else (b0, b1, b2)
        return np.stack(trip, axis=-1).tobytes()
    if bits == 32:
        return flat.astype(">i4" if big_endian else "<i4").tobytes()
    raise ValueError(bits)


def make_wav(
    pcm: np.ndarray,
    sample_rate: int = 44100,
    bits: int = 16,
    *,
    float32: bool = False,
    float64: bool = False,
    extensible: bool = False,
    extra_chunks: list[tuple[bytes, bytes]] | None = None,
    data_override: bytes | None = None,
    fmt_code_override: int | None = None,
    block_align_override: int | None = None,
    fmt_tail: bytes | None = None,
    valid_bits_override: int | None = None,
    rf64: bool = False,
    rf64_sample_count: int = 0,
) -> bytes:
    """Build a RIFF/WAVE blob from [frames, channels] integer PCM.

    ``extra_chunks`` inserts (id, payload) chunks before "data" to exercise
    the chunk walk.  ``data_override`` substitutes raw data-chunk bytes.
    ``fmt_tail`` appends bytes after the 16-byte fmt base (cbSize + extra
    fields — compressed formats); ``block_align_override`` sets
    nBlockAlign directly (ADPCM block size)."""
    frames, channels = pcm.shape
    data = (
        data_override
        if data_override is not None
        else pcm_to_bytes(pcm, bits, big_endian=False, unsigned8=bits == 8,
                          float32=float32, float64=float64)
    )
    block_align = (channels * (bits // 8) if block_align_override is None
                   else block_align_override)
    byte_rate = sample_rate * block_align
    fmt_code = fmt_code_override or (3 if (float32 or float64) else 1)

    if extensible:
        guid_tail = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xAA\x00\x38\x9B\x71"
        # the Samples union at offset 18: wValidBitsPerSample for PCM,
        # wSamplesPerBlock for compressed formats (ADPCM)
        samples_field = (bits if valid_bits_override is None
                         else valid_bits_override)
        fmt = struct.pack(
            "<HHIIHHHHI",
            0xFFFE, channels, sample_rate, byte_rate, block_align, bits,
            22, samples_field, (1 << channels) - 1,
        ) + struct.pack("<H", fmt_code) + guid_tail
    else:
        fmt = struct.pack(
            "<HHIIHH", fmt_code, channels, sample_rate, byte_rate,
            block_align, bits,
        )
        if fmt_tail is not None:
            fmt += fmt_tail

    chunks = [(b"fmt ", fmt)]
    for cid, payload in extra_chunks or []:
        chunks.append((cid, payload))
    chunks.append((b"data", data))

    if rf64:
        # EBU RF64: ds64 leads with the true 64-bit sizes; the data
        # chunk header carries the 0xFFFFFFFF sentinel
        body = b"WAVE"
        ds64 = struct.pack("<QQQI", 0, len(data), rf64_sample_count, 0)
        body += b"ds64" + struct.pack("<I", len(ds64)) + ds64
        for cid, payload in chunks:
            size = 0xFFFFFFFF if cid == b"data" else len(payload)
            body += cid + struct.pack("<I", size) + payload
            if len(payload) & 1:
                body += b"\x00"
        return b"RF64" + struct.pack("<I", 0xFFFFFFFF) + body

    body = b"WAVE"
    for cid, payload in chunks:
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"  # RIFF word alignment pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_aiff(
    pcm: np.ndarray,
    sample_rate: int = 44100,
    bits: int = 16,
    *,
    ssnd_offset: int = 0,
    extra_chunks: list[tuple[bytes, bytes]] | None = None,
    comm_size: int | None = None,
    compression: bytes | None = None,
    data_override: bytes | None = None,
    frames_override: int | None = None,
) -> bytes:
    """Build a FORM/AIFF blob from [frames, channels] integer PCM.

    compression: AIFC compression fourcc (b"NONE", b"sowt", ...) — emits
    an AIFC form with FVER + extended COMM; b"sowt" stores the samples
    little-endian.  ``data_override`` substitutes raw SSND sample bytes
    (companded formats); pair it with ``frames_override`` since COMM
    carries the frame count explicitly."""
    frames, channels = pcm.shape
    if frames_override is not None:
        frames = frames_override
    little = compression == b"sowt"
    data = data_override if data_override is not None else pcm_to_bytes(
        pcm, bits, big_endian=not little,
        float32=compression in (b"fl32", b"FL32"),
        float64=compression in (b"fl64", b"FL64"),
    )
    comm = (
        struct.pack(">hIh", channels, frames, bits)
        + _pack_ieee_extended(float(sample_rate))
    )
    if compression is not None:
        comm += compression + b"\x00\x00"  # empty pascal compression name
    ssnd = struct.pack(">II", ssnd_offset, 0) + b"\x00" * ssnd_offset + data

    chunks = [(b"COMM", comm, comm_size)]
    if compression is not None:
        chunks.insert(0, (b"FVER", struct.pack(">I", 0xA2805140), None))
    for cid, payload in extra_chunks or []:
        chunks.append((cid, payload, None))
    chunks.append((b"SSND", ssnd, None))

    body = b"AIFF" if compression is None else b"AIFC"
    for cid, payload, size_override in chunks:
        size = len(payload) if size_override is None else size_override
        body += cid + struct.pack(">I", size) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"FORM" + struct.pack(">I", len(body)) + body


def make_au(
    pcm: np.ndarray,
    sample_rate: int = 44100,
    encoding: int = 3,
    *,
    data_override: bytes | None = None,
    data_size_override: int | None = None,
    data_offset: int = 28,
) -> bytes:
    """Build a Sun AU / NeXT SND blob (fixed big-endian header).

    encoding: 1 µ-law, 2 int8, 3 int16, 4 int24, 5 int32, 6 f32, 7 f64,
    27 A-law; PCM/float data comes from ``pcm`` (big-endian), companded
    data via ``data_override``.  ``data_size_override`` lets tests write
    the 0xFFFFFFFF unknown-size sentinel."""
    frames, channels = pcm.shape
    bits = {2: 8, 3: 16, 4: 24, 5: 32, 6: 32, 7: 64}.get(encoding, 8)
    data = (data_override if data_override is not None else pcm_to_bytes(
        pcm, bits, big_endian=True,
        float32=encoding == 6, float64=encoding == 7))
    size = len(data) if data_size_override is None else data_size_override
    hdr = struct.pack(">4sIIIII", b".snd", data_offset, size,
                      encoding, sample_rate, channels)
    return hdr + b"\x00" * (data_offset - 24) + data


def make_caf(
    pcm: np.ndarray,
    sample_rate: int = 44100,
    codec: bytes = b"lpcm",
    bits: int = 16,
    *,
    little: bool = False,
    float_: bool = False,
    data_override: bytes | None = None,
    data_size_to_eof: bool = False,
    extra_chunks: list[tuple[bytes, bytes]] | None = None,
) -> bytes:
    """Build an Apple CAF blob (int64 BE chunk sizes, f64 rate).

    codec: b"lpcm" (bits + little/float_ flags), b"ulaw"/b"alaw"
    (data_override carries the companded bytes), b"ima4"
    (data_override carries 34-byte packets).  ``data_size_to_eof``
    writes the -1 unknown-size convention on the data chunk."""
    frames, channels = pcm.shape
    if codec == b"lpcm":
        data = (data_override if data_override is not None else
                pcm_to_bytes(pcm, bits, big_endian=not little,
                             float32=float_ and bits == 32,
                             float64=float_ and bits == 64))
        flags = (1 if float_ else 0) | (2 if little else 0)
        bytes_pp, frames_pp = channels * (bits // 8), 1
    elif codec in (b"ulaw", b"alaw"):
        data = data_override
        flags, bytes_pp, frames_pp, bits = 0, channels, 1, 16
    elif codec == b"ima4":
        data = data_override
        flags, bytes_pp, frames_pp, bits = 0, 34 * channels, 64, 16
    else:
        data = data_override or b""
        flags, bytes_pp, frames_pp = 0, 0, 0
    desc = struct.pack(">d4sIIIII", float(sample_rate), codec, flags,
                       bytes_pp, frames_pp, channels, bits)
    out = b"caff" + struct.pack(">HH", 1, 0)
    out += b"desc" + struct.pack(">q", len(desc)) + desc
    for cid, payload in extra_chunks or []:
        out += cid + struct.pack(">q", len(payload)) + payload
    body = struct.pack(">I", 0) + data  # u32 edit count + audio
    size = -1 if data_size_to_eof else len(body)
    out += b"data" + struct.pack(">q", size) + body
    return out
