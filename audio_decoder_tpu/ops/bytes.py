"""Vectorized byte- and bit-level readers over uint8 tensors.

The reference walks files with a scalar byte cursor and per-byte loops
(little-endian ``parse_bytes`` at blast/src/file_parsing/wav.rs:46-67,
big-endian at aiff.rs:25-48).  On TPU these become gather + shift/or over
uint8 tensors: a read of a multi-byte integer at a dynamic offset is a
4-byte ``dynamic_slice`` assembled with shifts, and batched reads are the
same ops ``vmap``-ed over files/frames.

All functions are jit/vmap-safe: offsets may be traced scalars, buffers are
1-D uint8 arrays (callers ``vmap`` the file axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def fourcc(tag: str) -> int:
    """Pack a 4-char chunk id into a big-endian u32 for comparisons
    (e.g. ``fourcc('RIFF')``).  Host-side constant helper."""
    assert len(tag) == 4
    v = 0
    for ch in tag:
        v = (v << 8) | ord(ch)
    return v


def _gather4(buf: jax.Array, off: jax.Array) -> jax.Array:
    """Fetch 4 consecutive bytes at dynamic offset (clamped at the edge)."""
    return lax.dynamic_slice_in_dim(buf, off, 4).astype(jnp.uint32)


def read_tag(buf: jax.Array, off: jax.Array) -> jax.Array:
    """Read a 4-byte chunk id as a big-endian u32 (compare with fourcc)."""
    b = _gather4(buf, off)
    return (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]


def read_u32le(buf: jax.Array, off: jax.Array) -> jax.Array:
    b = _gather4(buf, off)
    return (b[3] << 24) | (b[2] << 16) | (b[1] << 8) | b[0]


def read_u32be(buf: jax.Array, off: jax.Array) -> jax.Array:
    return read_tag(buf, off)


def read_u16le(buf: jax.Array, off: jax.Array) -> jax.Array:
    b = _gather4(buf, off)
    return (b[1] << 8) | b[0]


def read_u16be(buf: jax.Array, off: jax.Array) -> jax.Array:
    b = _gather4(buf, off)
    return (b[0] << 8) | b[1]


def read_ieee_extended(buf: jax.Array, off: jax.Array) -> jax.Array:
    """Decode an IEEE 754 80-bit extended float at ``off`` to f64-ish f32.

    Integer-ops port of the reference's sign/exponent/64-bit-mantissa decode
    (blast/src/file_parsing/aiff.rs:51-94).  AIFF sample rates are small
    integers, so computing ``mant_hi * 2^(e+32) + mant_lo * 2^e`` in f32 is
    exact for every realistic rate; inf/NaN inputs map to 0 with the caller
    flagging invalid data.
    """
    b = lax.dynamic_slice_in_dim(buf, off, 10).astype(jnp.uint32)
    sign = (b[0] >> 7) & 1
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant_hi = (b[2] << 24) | (b[3] << 16) | (b[4] << 8) | b[5]
    mant_lo = (b[6] << 24) | (b[7] << 16) | (b[8] << 8) | b[9]
    e = exp.astype(jnp.int32) - 16383 - 63
    val = (
        mant_hi.astype(jnp.float32) * jnp.exp2(e.astype(jnp.float32) + 32.0)
        + mant_lo.astype(jnp.float32) * jnp.exp2(e.astype(jnp.float32))
    )
    zero = jnp.logical_and(exp == 0, jnp.logical_and(mant_hi == 0, mant_lo == 0))
    bad = exp == 0x7FFF  # inf/NaN
    val = jnp.where(jnp.logical_or(zero, bad), 0.0, val)
    return jnp.where(sign == 1, -val, val)


def read_bits(buf: jax.Array, bitpos: jax.Array, width) -> jax.Array:
    """Read ``width`` bits MSB-first starting at absolute bit offset.

    ``width`` may be a traced scalar in [0, 25].  Assembles a 32-bit
    big-endian window from 4 bytes and shifts — the vectorized equivalent of
    an MPEG bitstream reader.  Reads past the buffer are clamped (callers
    bound-check separately).
    """
    byte = bitpos >> 3
    bit = (bitpos & 7).astype(jnp.uint32)
    b = _gather4(buf, byte)
    window = (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]
    w = jnp.asarray(width, jnp.uint32)
    shifted = (window << bit) >> (32 - w)
    return jnp.where(w == 0, jnp.uint32(0), shifted)


def gather_bytes(buf: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched byte gather with clipping: ``buf[idx]`` for arbitrary-shaped
    int32 index tensors.  The workhorse behind batched sample unpacking."""
    return jnp.take(buf, idx, axis=0, mode="clip")
