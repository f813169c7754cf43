"""AIFF/FORM decoding as batched device ops.

The reference parses AIFF with a fixed-order FORM → COMM → SSND cursor walk,
big-endian multi-byte reads, an IEEE 754 80-bit extended-float sample rate,
and a scalar 16-bit BE unpack loop (blast/src/file_parsing/aiff.rs:99-183).
Here the chunk walk is a vmapped ``lax.while_loop`` (chunks may appear in
any IFF order), the IEEE-80 decode is integer ops (ops.bytes.read_ieee_extended
≙ aiff.rs:51-94), and unpacking handles 8/16/24/32-bit signed big-endian
PCM plus AIFC sowt (LE PCM) and fl32/fl64 (BE IEEE float) — the reference
hard-assumed 16-bit regardless of the COMM sample size (aiff.rs:159-170,
SURVEY §5 defect 6).

COMM size is validated as 18 exactly like the reference (aiff.rs:122-126 →
InvalidData).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core import errors as E
from ..ops.bytes import fourcc, read_ieee_extended, read_tag, read_u16be, read_u32be

_FORM = fourcc("FORM")
_AIFF = fourcc("AIFF")
_AIFC = fourcc("AIFC")
_COMM = fourcc("COMM")
_SSND = fourcc("SSND")
_NONE = fourcc("NONE")
_SOWT = fourcc("sowt")
_TWOS = fourcc("twos")  # explicit big-endian PCM (synonym of NONE)
_FL32 = fourcc("fl32")
_FL32U = fourcc("FL32")  # SoundManager emits uppercase variants
_FL64 = fourcc("fl64")
_FL64U = fourcc("FL64")
_ULAW = fourcc("ulaw")
_ULAWU = fourcc("ULAW")  # SoundManager uppercase variants
_ALAW = fourcc("alaw")
_ALAWU = fourcc("ALAW")
_IMA4 = fourcc("ima4")  # Apple/QuickTime IMA: 34-byte 64-sample packets

_MAX_CHUNKS = 128


def _parse_one(buf: jax.Array, flen: jax.Array):
    flen = flen.astype(jnp.int32)
    i32 = jnp.int32

    form_type = read_tag(buf, i32(8))
    is_aifc = form_type == _AIFC
    ok_magic = jnp.logical_and(
        flen >= 12,
        jnp.logical_and(
            read_tag(buf, i32(0)) == _FORM,
            jnp.logical_or(form_type == _AIFF, is_aifc),
        ),
    )

    # state: cursor, iter, comm_off, comm_size, ssnd_off, ssnd_size, err
    def cond(s):
        cursor, it, comm_off, comm_size, ssnd_off, ssnd_size, err = s
        more = jnp.logical_and(cursor + 8 <= flen, it < _MAX_CHUNKS)
        found_both = jnp.logical_and(comm_off >= 0, ssnd_off >= 0)
        return jnp.logical_and(
            jnp.logical_and(more, jnp.logical_not(found_both)), err == E.ERR_OK
        )

    def body(s):
        cursor, it, comm_off, comm_size, ssnd_off, ssnd_size, err = s
        cid = read_tag(buf, cursor)
        csize = read_u32be(buf, cursor + 4).astype(i32)
        payload = cursor + 8
        is_comm = cid == _COMM
        is_ssnd = cid == _SSND
        comm_off = jnp.where(is_comm, payload, comm_off)
        comm_size = jnp.where(is_comm, csize, comm_size)
        trunc = jnp.logical_and(is_ssnd, payload + csize > flen)
        err = jnp.where(trunc, i32(E.ERR_EOF), err)
        ssnd_off = jnp.where(is_ssnd, payload, ssnd_off)
        ssnd_size = jnp.where(is_ssnd, csize, ssnd_size)
        cursor = payload + csize + (csize & 1)  # IFF chunks are word-aligned
        return cursor, it + 1, comm_off, comm_size, ssnd_off, ssnd_size, err

    init = (i32(12), i32(0), i32(-1), i32(0), i32(-1), i32(0), i32(E.ERR_OK))
    _, _, comm_off, comm_size, ssnd_off, ssnd_size, err = lax.while_loop(
        cond, body, init
    )

    err = jnp.where(ok_magic, err, i32(E.ERR_UNSUPPORTED))
    # "Comm size should be 18" (aiff.rs:122-126) — checked as soon as COMM
    # is seen, before any missing-SSND EOF (a bad size misaligns the
    # walk).  AIFC COMMs carry a compression fourcc + pascal name (>= 22
    # bytes, beyond the reference, which predates AIFC support).
    bad_comm = jnp.logical_and(
        comm_off >= 0,
        jnp.where(is_aifc, comm_size < 22, comm_size != 18),
    )
    err = jnp.where(jnp.logical_and(err == E.ERR_OK, bad_comm), i32(E.ERR_INVALID), err)
    missing = jnp.logical_or(comm_off < 0, ssnd_off < 0)
    err = jnp.where(jnp.logical_and(err == E.ERR_OK, missing), i32(E.ERR_EOF), err)

    p = jnp.maximum(comm_off, 0)
    channels = read_u16be(buf, p).astype(i32)
    comm_frames = read_u32be(buf, p + 2).astype(i32)
    bits = read_u16be(buf, p + 6).astype(i32)
    rate_f = read_ieee_extended(buf, p + 8)
    sample_rate = jnp.round(rate_f).astype(i32)

    q = jnp.maximum(ssnd_off, 0)
    # SSND payload: offset u32 + blockSize u32, then sample data
    # (aiff.rs:146-157; the reference's data size is ckSize - 8).
    offset = read_u32be(buf, q).astype(i32)
    data_off = q + 8 + offset
    data_size = jnp.maximum(ssnd_size - 8 - offset, 0)

    # AIFC compression type: NONE/twos (big-endian PCM), sowt
    # (little-endian PCM, the common Mac variant), fl32/fl64 (big-endian
    # IEEE float), ulaw/alaw (G.711 companded, 1 byte/sample — COMM's
    # sampleSize declares the DECODED width, 16, per the AIFC spec, though
    # some writers put 8); all compression fourccs in both case variants;
    # anything else is unsupported
    comp = jnp.where(is_aifc, read_tag(buf, p + 18), _NONE)
    little = comp == _SOWT
    f32c = jnp.logical_or(comp == _FL32, comp == _FL32U)
    f64c = jnp.logical_or(comp == _FL64, comp == _FL64U)
    ulawc = jnp.logical_or(comp == _ULAW, comp == _ULAWU)
    alawc = jnp.logical_or(comp == _ALAW, comp == _ALAWU)
    g711 = jnp.logical_or(ulawc, alawc)
    int_ok = jnp.logical_and(
        jnp.logical_or(
            jnp.logical_or(bits == 8, bits == 16),
            jnp.logical_or(bits == 24, bits == 32),
        ),
        jnp.logical_or(
            jnp.logical_or(comp == _NONE, comp == _TWOS), little
        ),
    )
    float_ok = jnp.logical_or(
        jnp.logical_and(f32c, bits == 32), jnp.logical_and(f64c, bits == 64)
    )
    g711_ok = jnp.logical_and(
        g711, jnp.logical_or(bits == 8, bits == 16)
    )
    ima4 = comp == _IMA4
    ima4_ok = jnp.logical_and(ima4, bits == 16)
    supported = jnp.logical_or(
        jnp.logical_or(jnp.logical_or(int_ok, float_ok), g711_ok), ima4_ok
    )
    err = jnp.where(
        jnp.logical_and(err == E.ERR_OK, jnp.logical_not(supported)),
        i32(E.ERR_UNSUPPORTED),
        err,
    )
    bad_geom = jnp.logical_or(channels <= 0, sample_rate <= 0)
    err = jnp.where(
        jnp.logical_and(err == E.ERR_OK, bad_geom), i32(E.ERR_INVALID), err
    )

    # companded samples are stored 1 byte each regardless of COMM's
    # (decoded) sampleSize
    bps = jnp.where(g711, i32(1), bits // 8)
    denom = jnp.maximum(channels * bps, 1)
    # ima4: whole 34·C-byte packet groups of 64 frames each
    n_ima4 = (data_size // jnp.maximum(34 * channels, 1)) * 64
    n_frames = jnp.minimum(
        comm_frames,
        jnp.where(ima4, n_ima4, data_size // denom),
    )
    # fmt_code: 0 BE PCM, 1 sowt LE PCM, 2 fl32, 3 fl64, 4 ulaw, 5 alaw,
    # 6 ima4
    fmt_code = jnp.where(
        ima4, i32(6), jnp.where(
            alawc, i32(5), jnp.where(
                ulawc, i32(4), jnp.where(
                    f64c, i32(3),
                    jnp.where(f32c, i32(2), little.astype(i32))
                )
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
    )


@jax.jit
def parse_meta_batch(bufs: jax.Array, lens: jax.Array):
    """Parse AIFF headers for a packed batch: u8 [B, N] + lens [B] → dict of
    i32 [B] metadata arrays."""
    return jax.vmap(_parse_one)(bufs, lens)


def unpack_args(meta_host: dict) -> dict:
    """Static unpack config: AIFF is big-endian signed PCM at all depths;
    AIFC 'sowt' flips to little-endian (fmt_code 1), fl32/fl64
    (fmt_code 2/3) are big-endian IEEE float, ulaw/alaw (fmt_code 4/5)
    are G.711 companded bytes expanded by the same device LUTs as the
    WAV format codes, and ima4 (fmt_code 6) is Apple/QuickTime IMA
    decoded by the block-parallel scan kernel (34·C-byte groups)."""
    code = int(meta_host["fmt_code"])
    g711 = code in (4, 5)
    if code == 6:
        return dict(
            bits=4, big_endian=True, unsigned8=False, is_float=False,
            companded=None, adpcm="ima4",
            block_align=34 * int(meta_host["channels"]),
        )
    return dict(
        bits=8 if g711 else int(meta_host["bits"]),
        big_endian=code != 1,
        unsigned8=False,  # AIFF 8-bit is signed (unlike WAV)
        is_float=code in (2, 3),
        companded=("ulaw" if code == 4 else "alaw") if g711 else None,
    )
