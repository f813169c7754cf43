"""Apple CAF (Core Audio Format) decoding as batched device ops.

CAF is a chunked container with INT64 big-endian chunk sizes: an 8-byte
file header ('caff', version, flags), a 32-byte 'desc' chunk (float64
sample rate, codec fourcc, format flags, packet geometry), and a 'data'
chunk whose size may be -1 ("unknown — runs to EOF", the streaming-write
convention).  Every codec CAF commonly carries maps onto kernels this
framework already pins: 'lpcm' (8/16/24/32-bit int and f32/f64, either
endianness via the format flags), 'ulaw'/'alaw' (G.711 device LUTs) and
'ima4' (the block-parallel Apple IMA scan shared with AIFF-C).

The device walk reads each int64 size as two u32 words; a size whose
high word is nonzero cannot fit an int32-indexed device buffer and
fails the truncation check (the host streaming parser keeps exact
Python ints for true > 4 GB files).  The f64 sample-rate decode is pure
integer ops — audio rates are exact small integers, so the mantissa
shift loses nothing.  Beyond the reference's containers
(blast/src/main.rs:38-77 dispatches wav/aif only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core import errors as E
from ..ops.bytes import fourcc, read_tag, read_u16be, read_u32be

_CAFF = fourcc("caff")
_DESC = fourcc("desc")
_DATA = fourcc("data")
_LPCM = fourcc("lpcm")
_ULAW = fourcc("ulaw")
_ALAW = fourcc("alaw")
_IMA4 = fourcc("ima4")

#: kCAFLinearPCMFormatFlag bits
_FLAG_FLOAT = 1
_FLAG_LITTLE = 2

_MAX_CHUNKS = 128

META_FIELDS = (
    "err", "fmt_code", "channels", "sample_rate", "bits",
    "data_off", "data_size", "n_frames", "flags",
)


def _read_f64be_int(buf: jax.Array, p) -> jax.Array:
    """Decode a big-endian IEEE float64 at ``p`` to the nearest int32.

    No x64 mode needed: the significand's top 24 bits are assembled in
    float32 and scaled by ldexp — exact for every value with ≤ 24
    significant bits, which covers all real audio rates (≤ 192000)."""
    hi = read_u32be(buf, p).astype(jnp.uint32)
    lo = read_u32be(buf, p + 4).astype(jnp.uint32)
    e = ((hi >> 20) & 0x7FF).astype(jnp.int32)
    hi_s = ((hi & 0xFFFFF) | (1 << 20)).astype(jnp.float32)  # top 21 bits
    sig = hi_s * jnp.float32(4294967296.0) + lo.astype(jnp.float32)
    val = jnp.ldexp(sig, jnp.clip(e - 1075, -100, 40))
    val = jnp.where(e == 0, jnp.float32(0.0), val)  # zero/subnormal → 0
    val = jnp.where(e == 0x7FF, jnp.float32(0.0), val)  # inf/NaN → 0
    val = jnp.where((hi >> 31) != 0, jnp.float32(0.0), val)  # negative → 0
    return jnp.round(
        jnp.clip(val, 0.0, jnp.float32(2**31 - 128))
    ).astype(jnp.int32)


def _parse_one(buf: jax.Array, flen: jax.Array):
    flen = flen.astype(jnp.int32)
    i32 = jnp.int32

    ok_magic = jnp.logical_and(
        flen >= 8,
        jnp.logical_and(read_tag(buf, i32(0)) == _CAFF,
                        read_u16be(buf, i32(4)).astype(i32) == 1),
    )

    # state: cursor, iter, desc_off, data_off, data_size, err
    def cond(s):
        cursor, it, desc_off, data_off, data_size, err = s
        more = jnp.logical_and(cursor + 12 <= flen, it < _MAX_CHUNKS)
        return jnp.logical_and(
            jnp.logical_and(more, data_off < 0), err == E.ERR_OK
        )

    def body(s):
        cursor, it, desc_off, data_off, data_size, err = s
        cid = read_tag(buf, cursor)
        size_hi = read_u32be(buf, cursor + 4).astype(i32)
        size_lo = read_u32be(buf, cursor + 8).astype(i32)
        payload = cursor + 12
        # int64 size: -1 (all ones) = "to EOF" (only legal on the last
        # chunk); a high word that is neither 0 nor the -1 sentinel
        # cannot fit an int32-indexed device buffer
        to_eof = jnp.logical_and(size_hi == -1, size_lo == -1)
        csize = jnp.where(to_eof, flen - payload, size_lo)
        overflow = jnp.logical_and(
            size_hi != 0, jnp.logical_not(to_eof)
        )
        overflow = jnp.logical_or(overflow, csize < 0)
        is_desc = cid == _DESC
        is_data = cid == _DATA
        desc_off = jnp.where(is_desc, payload, desc_off)
        trunc = jnp.logical_or(payload + csize > flen, overflow)
        err = jnp.where(
            jnp.logical_and(jnp.logical_or(is_desc, is_data), trunc),
            i32(E.ERR_EOF), err,
        )
        # data payload: u32 edit count, then the audio bytes
        data_off = jnp.where(is_data, payload + 4, data_off)
        data_size = jnp.where(is_data, jnp.maximum(csize - 4, 0), data_size)
        cursor = payload + csize
        return cursor, it + 1, desc_off, data_off, data_size, err

    init = (i32(8), i32(0), i32(-1), i32(-1), i32(0), i32(E.ERR_OK))
    _, _, desc_off, data_off, data_size, err = lax.while_loop(
        cond, body, init
    )

    err = jnp.where(ok_magic, err, i32(E.ERR_UNSUPPORTED))
    missing = jnp.logical_or(desc_off < 0, data_off < 0)
    err = jnp.where(
        jnp.logical_and(err == E.ERR_OK, missing), i32(E.ERR_EOF), err
    )

    # desc chunk: f64 rate, fourcc codec, u32 flags, u32 bytes/packet,
    # u32 frames/packet, u32 channels, u32 bits
    p = jnp.maximum(desc_off, 0)
    sample_rate = _read_f64be_int(buf, p)
    codec = read_tag(buf, p + 8)
    flags = read_u32be(buf, p + 12).astype(i32)
    bytes_pp = read_u32be(buf, p + 16).astype(i32)
    frames_pp = read_u32be(buf, p + 20).astype(i32)
    channels = read_u32be(buf, p + 24).astype(i32)
    bits = read_u32be(buf, p + 28).astype(i32)

    is_lpcm = codec == _LPCM
    is_ulaw = codec == _ULAW
    is_alaw = codec == _ALAW
    is_ima4 = codec == _IMA4
    g711 = jnp.logical_or(is_ulaw, is_alaw)

    is_float = jnp.logical_and(is_lpcm, (flags & _FLAG_FLOAT) != 0)
    lpcm_ok = jnp.logical_and(
        is_lpcm,
        jnp.where(
            is_float,
            jnp.logical_or(bits == 32, bits == 64),
            jnp.logical_or(
                jnp.logical_or(bits == 8, bits == 16),
                jnp.logical_or(bits == 24, bits == 32),
            ),
        ),
    )
    # lpcm packets must be packed frames (no per-packet padding)
    lpcm_ok = jnp.logical_and(
        lpcm_ok,
        jnp.logical_and(frames_pp == 1,
                        bytes_pp == channels * (bits // 8)),
    )
    g711_ok = jnp.logical_and(
        g711, jnp.logical_and(bytes_pp == channels, frames_pp == 1)
    )
    ima4_ok = jnp.logical_and(
        is_ima4,
        jnp.logical_and(bytes_pp == 34 * channels, frames_pp == 64),
    )
    supported = jnp.logical_or(jnp.logical_or(lpcm_ok, g711_ok), ima4_ok)
    err = jnp.where(
        jnp.logical_and(err == E.ERR_OK, jnp.logical_not(supported)),
        i32(E.ERR_UNSUPPORTED), err,
    )
    bad_geom = jnp.logical_or(channels <= 0, sample_rate <= 0)
    err = jnp.where(
        jnp.logical_and(err == E.ERR_OK, bad_geom), i32(E.ERR_INVALID), err
    )

    bps = jnp.where(g711, i32(1), bits // 8)
    n_frames = jnp.where(
        is_ima4,
        (data_size // jnp.maximum(34 * channels, 1)) * 64,
        data_size // jnp.maximum(channels * bps, 1),
    )
    # fmt_code: 0 lpcm-int, 1 lpcm-float, 4 ulaw, 5 alaw, 6 ima4
    # (same G.711/ima4 codes as the AIFF family for familiarity)
    fmt_code = jnp.where(
        is_ima4, i32(6), jnp.where(
            is_alaw, i32(5), jnp.where(
                is_ulaw, i32(4), is_float.astype(i32)
            )
        )
    )
    return dict(
        err=err,
        fmt_code=fmt_code,
        channels=channels,
        sample_rate=sample_rate,
        bits=bits,
        data_off=data_off,
        data_size=data_size,
        n_frames=n_frames,
        flags=flags,
    )


@jax.jit
def parse_meta_batch(bufs: jax.Array, lens: jax.Array):
    """Parse CAF headers for a packed batch: u8 [B, N] + lens [B] → dict
    of i32 [B] metadata arrays (one compiled chunk walk for all files)."""
    return jax.vmap(_parse_one)(bufs, lens)


def unpack_args(meta_host: dict) -> dict:
    """Static unpack config from desc: lpcm follows the float/endian
    flags; ulaw/alaw ride the G.711 LUTs; ima4 rides the Apple IMA
    block-parallel kernel (34·C-byte groups)."""
    code = int(meta_host["fmt_code"])
    if code == 6:
        return dict(
            bits=4, big_endian=True, unsigned8=False, is_float=False,
            companded=None, adpcm="ima4",
            block_align=34 * int(meta_host["channels"]),
        )
    if code in (4, 5):
        return dict(
            bits=8, big_endian=True, unsigned8=False, is_float=False,
            companded="ulaw" if code == 4 else "alaw",
        )
    return dict(
        bits=int(meta_host["bits"]),
        big_endian=not (int(meta_host["flags"]) & _FLAG_LITTLE),
        unsigned8=False,  # CAF integer lpcm is signed
        is_float=code == 1,
        companded=None,
    )
