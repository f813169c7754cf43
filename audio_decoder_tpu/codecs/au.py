"""Sun AU / NeXT SND decoding as batched device ops.

The simplest container in the family: a fixed big-endian header (magic
".snd", data offset, data size, encoding, rate, channels) followed by
raw samples — no chunk walk at all, so the batched parser is pure
fixed-offset gathers.  Every AU encoding maps onto unpack kernels the
WAV/AIFF families already use: G.711 µ-law/A-law device LUTs, signed
8/16/24/32-bit big-endian PCM, and IEEE float32/64 (the float64 path
reuses the x64-free demotion).  Beyond the reference's containers
(blast/src/main.rs:38-77 dispatches wav/aif only), added because real
asset folders carry .au files and the decode surface is free.

Encodings (header word 3): 1 µ-law, 2 int8, 3 int16, 4 int24, 5 int32,
6 float32, 7 float64, 27 A-law — all big-endian.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import errors as E
from ..ops.bytes import fourcc, read_tag, read_u32be

_MAGIC = fourcc(".snd")

#: encoding → (bits, is_float, companded) — the decode capability matrix
ENCODINGS = {
    1: (8, False, "ulaw"),
    2: (8, False, None),
    3: (16, False, None),
    4: (24, False, None),
    5: (32, False, None),
    6: (32, True, None),
    7: (64, True, None),
    27: (8, False, "alaw"),
}

META_FIELDS = (
    "err", "fmt_code", "channels", "sample_rate", "bits",
    "data_off", "data_size", "n_frames",
)


def _parse_one(buf: jax.Array, flen: jax.Array):
    flen = flen.astype(jnp.int32)
    i32 = jnp.int32

    ok_magic = jnp.logical_and(flen >= 24, read_tag(buf, i32(0)) == _MAGIC)
    data_off = read_u32be(buf, i32(4)).astype(i32)
    data_size = read_u32be(buf, i32(8)).astype(i32)
    enc = read_u32be(buf, i32(12)).astype(i32)
    sample_rate = read_u32be(buf, i32(16)).astype(i32)
    channels = read_u32be(buf, i32(20)).astype(i32)

    err = jnp.where(ok_magic, i32(E.ERR_OK), i32(E.ERR_UNSUPPORTED))

    # capability matrix as a vector select (8 supported encodings)
    bits = i32(0)
    for code, (b, _f, _c) in ENCODINGS.items():
        bits = jnp.where(enc == code, i32(b), bits)
    err = jnp.where(
        jnp.logical_and(err == E.ERR_OK, bits == 0),
        i32(E.ERR_UNSUPPORTED), err,
    )
    bad_geom = jnp.logical_or(
        jnp.logical_or(channels <= 0, sample_rate <= 0), data_off < 24
    )
    err = jnp.where(
        jnp.logical_and(err == E.ERR_OK, bad_geom), i32(E.ERR_INVALID), err
    )
    err = jnp.where(
        jnp.logical_and(err == E.ERR_OK, data_off > flen),
        i32(E.ERR_EOF), err,
    )

    # data_size 0xFFFFFFFF (-1 as int32) = "unknown, read to EOF" — the
    # common writer convention; also clamp any declared size to the file
    avail = jnp.maximum(flen - data_off, 0)
    data_size = jnp.where(data_size < 0, avail, jnp.minimum(data_size, avail))
    g711 = jnp.logical_or(enc == 1, enc == 27)
    bps = jnp.where(g711, i32(1), bits // 8)
    n_frames = data_size // jnp.maximum(channels * bps, 1)
    return dict(
        err=err,
        fmt_code=enc,
        channels=channels,
        sample_rate=sample_rate,
        bits=bits,
        data_off=data_off,
        data_size=data_size,
        n_frames=n_frames,
    )


@jax.jit
def parse_meta_batch(bufs: jax.Array, lens: jax.Array):
    """Parse AU headers for a packed batch: u8 [B, N] + lens [B] → dict
    of i32 [B] metadata arrays (fixed-offset reads, vmapped)."""
    return jax.vmap(_parse_one)(bufs, lens)


def unpack_args(meta_host: dict) -> dict:
    """Static unpack config from the encoding word (all big-endian)."""
    bits, is_float, companded = ENCODINGS[int(meta_host["fmt_code"])]
    return dict(
        bits=8 if companded else bits,
        big_endian=True,
        unsigned8=False,  # AU 8-bit PCM is signed two's complement
        is_float=is_float,
        companded=companded,
    )
