"""Batched PCM sample unpacking: uint8 byte tensors → f32 planar PCM.

This replaces the reference's hottest decode loops — the scalar byte-pair
unpack walks at blast/src/file_parsing/wav.rs:143-154 (LE) and
aiff.rs:159-170 (BE) — with one fused gather + integer-assemble + scale op
over the whole batch.  XLA fuses the gathers, shifts, and the f32 scale into
a single HBM-bandwidth-bound pass on the VPU; there is no per-sample control
flow.

Beyond the reference (which hard-assumes 16-bit, SURVEY §5 defect 6) this
supports 8/16/24/32-bit integer PCM, unsigned 8-bit (WAV convention),
signed 8-bit (AIFF), both endiannesses, and IEEE float32 WAV.

Conversion convention (the framework-wide PCM contract):
  int N-bit  →  f32 = signed_int / 2^(N-1)      (bit-exact for N ≤ 24)
  float32    →  passthrough
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _g711_tables():
    """G.711 companding decode tables, byte → int16 (ITU-T G.711)."""
    alaw = np.zeros(256, np.float32)
    ulaw = np.zeros(256, np.float32)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0xF) << 4
        seg = (a >> 4) & 7
        t = ((t + 0x108) << (seg - 1)) if seg else (t + 8)
        alaw[b] = t if (a & 0x80) else -t
        u = ~b & 0xFF
        m = (((u & 0xF) << 3) + 0x84) << ((u >> 4) & 7)
        ulaw[b] = (0x84 - m) if (u & 0x80) else (m - 0x84)
    return alaw / 32768.0, ulaw / 32768.0


_ALAW_F32, _ULAW_F32 = _g711_tables()


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits",
        "channels",
        "big_endian",
        "unsigned8",
        "is_float",
        "companded",
        "max_frames",
    ),
)
def unpack_pcm(
    bufs: jax.Array,      # u8 [B, N] raw file bytes
    data_off: jax.Array,  # i32 [B] byte offset of first sample
    n_frames: jax.Array,  # i32 [B] valid frame count per file
    *,
    bits: int,
    channels: int,
    big_endian: bool = False,
    unsigned8: bool = False,
    is_float: bool = False,
    companded: str | None = None,
    max_frames: int,
) -> jax.Array:
    """Unpack interleaved PCM to planar f32 ``[B, max_frames, channels]``.

    Frames beyond ``n_frames[b]`` are zero.  All shape-affecting parameters
    are static; callers group files by (bits, channels, endianness) so each
    group compiles once (see codecs.registry).  companded: "alaw"/"ulaw"
    8-bit G.711 expansion via a device LUT (the reference enumerates these
    WAV format codes but never decodes them, wav.rs:9-28).
    """
    bps = bits // 8
    nvals = max_frames * channels
    # Slice each file's sample region as ONE contiguous dynamic_slice —
    # the sample bytes are consecutive from data_off, so a per-element
    # gather (take_along_axis) would burn the TPU's worst op class
    # (~100 M elem/s) on affine indices; a dynamic slice runs at HBM
    # bandwidth.  dynamic_slice SHIFTS the start when the window would
    # run past the buffer (which would mis-align every sample), so pad
    # the buffer by a full span: any in-range data_off then slices
    # without clamping, and the padding bytes land only in frames the
    # n_frames mask zeroes anyway.
    span = nvals * bps
    pad = jnp.pad(bufs, ((0, 0), (0, span)))
    region = jax.vmap(
        lambda buf, off: jax.lax.dynamic_slice(buf, (off,), (span,))
    )(pad, data_off.astype(jnp.int32))                          # [B, span]
    region = region.reshape(bufs.shape[0], nvals, bps)

    def byte(k: int) -> jax.Array:
        return region[:, :, k].astype(jnp.uint32)

    if companded is not None:
        if bits != 8:
            raise ValueError("companded PCM must be 8-bit")
        lut = jnp.asarray(_ALAW_F32 if companded == "alaw" else _ULAW_F32)
        val = lut[byte(0).astype(jnp.int32)]
    elif is_float:
        if bits == 32:
            o = (3, 2, 1, 0) if not big_endian else (0, 1, 2, 3)
            word = (
                (byte(o[0]) << 24) | (byte(o[1]) << 16)
                | (byte(o[2]) << 8) | byte(o[3])
            )
            val = jax.lax.bitcast_convert_type(word, jnp.float32)
        elif bits == 64:
            # IEEE float64 → float32 without enabling jax x64: demote via
            # integer ops with round-half-to-even, including gradual
            # underflow into the f32-subnormal range (matches
            # np.float32(f64) for every finite value; NaNs stay NaN with
            # the quiet bit forced)
            o = tuple(range(8)) if big_endian else tuple(range(7, -1, -1))
            hi = (
                (byte(o[0]) << 24) | (byte(o[1]) << 16)
                | (byte(o[2]) << 8) | byte(o[3])
            )
            lo = (
                (byte(o[4]) << 24) | (byte(o[5]) << 16)
                | (byte(o[6]) << 8) | byte(o[7])
            )
            sign = hi >> 31
            e = ((hi >> 20) & 0x7FF).astype(jnp.int32)
            keep = ((hi & 0xFFFFF) << 3) | (lo >> 29)  # top 23 mantissa bits
            rem = lo & 0x1FFFFFFF
            half = jnp.uint32(1 << 28)
            round_up = (rem > half) | ((rem == half) & ((keep & 1) == 1))
            e32 = e - 1023 + 127
            # assemble exp|mant then add the rounding carry — mantissa
            # overflow correctly bumps the exponent in IEEE layout
            mag = (
                (jnp.clip(e32, 0, 255).astype(jnp.uint32) << 23) | keep
            ) + round_up.astype(jnp.uint32)
            # gradual underflow (e32 <= 0): shift the 24-bit significand
            # (implicit 1 | keep) right by 1-e32 with round-half-to-even;
            # rem plus the bits below the round bit form the sticky.  A
            # clamp at 31 is safe: past 25 the round bit is already 0 so
            # the result rounds to 0 (f64 subnormals, e == 0, land here
            # too — their spurious implicit 1 is shifted out entirely).
            sig24 = (jnp.uint32(1) << 23) | keep
            shift = jnp.clip(1 - e32, 1, 31).astype(jnp.uint32)
            kept_sub = sig24 >> shift
            low = sig24 & ((jnp.uint32(1) << shift) - 1)
            rbit = (low >> (shift - 1)) & 1
            sticky = (
                (low & ((jnp.uint32(1) << (shift - 1)) - 1)) != 0
            ) | (rem != 0)
            sub_round = rbit & (
                sticky | ((kept_sub & 1) == 1)
            ).astype(jnp.uint32)
            # rounding up to 1<<23 is FLT_MIN — correct in IEEE layout
            mag = jnp.where(e32 <= 0, kept_sub + sub_round, mag)
            mag = jnp.where(e32 >= 255, jnp.uint32(255) << 23, mag)  # → inf
            # e == 0x7FF: inf stays inf; NaN forces the quiet bit so a
            # payload living only in the low 29 mantissa bits (keep == 0)
            # cannot demote to inf
            is_nan = (e == 0x7FF) & ((((hi & 0xFFFFF) | lo)) != 0)
            mag = jnp.where(e == 0x7FF, jnp.uint32(255) << 23, mag)
            mag = jnp.where(
                is_nan, (jnp.uint32(255) << 23) | (jnp.uint32(1) << 22) | keep,
                mag,
            )
            val = jax.lax.bitcast_convert_type(
                (sign << 31) | mag, jnp.float32
            )
        else:
            raise ValueError("float PCM must be 32- or 64-bit")
    else:
        if bits == 8:
            raw = byte(0)
            if unsigned8:
                ival = raw.astype(jnp.int32) - 128
            else:
                ival = raw.astype(jnp.int32)
                ival = jnp.where(ival >= 128, ival - 256, ival)
        elif bits == 16:
            lo, hi = (byte(0), byte(1)) if not big_endian else (byte(1), byte(0))
            ival = (hi.astype(jnp.int32) << 8) | lo.astype(jnp.int32)
            ival = jnp.where(ival >= 1 << 15, ival - (1 << 16), ival)
        elif bits == 24:
            if not big_endian:
                b0, b1, b2 = byte(0), byte(1), byte(2)
            else:
                b2, b1, b0 = byte(0), byte(1), byte(2)
            ival = (
                (b2.astype(jnp.int32) << 16)
                | (b1.astype(jnp.int32) << 8)
                | b0.astype(jnp.int32)
            )
            ival = jnp.where(ival >= 1 << 23, ival - (1 << 24), ival)
        elif bits == 32:
            o = (3, 2, 1, 0) if not big_endian else (0, 1, 2, 3)
            word = (
                (byte(o[0]) << 24)
                | (byte(o[1]) << 16)
                | (byte(o[2]) << 8)
                | byte(o[3])
            )
            ival = word.astype(jnp.int32)
        else:
            raise ValueError(f"unsupported bit depth {bits}")
        val = ival.astype(jnp.float32) * jnp.float32(1.0 / (1 << (bits - 1)))

    pcm = val.reshape(bufs.shape[0], max_frames, channels)
    frame_ids = jnp.arange(max_frames, dtype=jnp.int32)[None, :, None]
    mask = frame_ids < n_frames[:, None, None]
    return jnp.where(mask, pcm, 0.0)
