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
from jax import lax


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
    """Unpack interleaved PCM to flat f32 ``[B, max_frames*channels]``
    (interleaved — the AudioBatch device layout, core/batch.py).

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

    # flat interleaved [B, max_frames*channels] — the AudioBatch device
    # layout (core/batch.py: a trailing channel dim would tile-pad 64x+)
    frame_ids = jnp.arange(nvals, dtype=jnp.int32)[None, :] // channels
    return jnp.where(frame_ids < n_frames[:, None], val, 0.0)


def _slice_region(bufs: jax.Array, data_off: jax.Array, span: int):
    """Per-file contiguous ``span``-byte window from ``data_off`` as ONE
    dynamic slice per file (same rationale as unpack_pcm's prologue:
    affine gathers are the TPU's worst op class; padding by a full span
    keeps dynamic_slice from shifting in-range starts)."""
    pad = jnp.pad(bufs, ((0, 0), (0, span)))
    return jax.vmap(
        lambda buf, off: jax.lax.dynamic_slice(buf, (off,), (span,))
    )(pad, data_off.astype(jnp.int32))


def _ima_scan(pred0: jax.Array, idx0: jax.Array, nib: jax.Array):
    """The IMA ADPCM nibble recurrence over [S, lanes] codes (shared by
    the WAV-IMA and Apple-ima4 kernels — one place to fix the
    arithmetic).  Returns the decoded samples, same shape as ``nib``."""
    steps = jnp.asarray(_IMA_STEPS)
    itab = jnp.asarray(_IMA_INDEX)

    def step_fn(carry, delta):
        pred, idx = carry
        step = steps[idx]
        vpdiff = (
            (step >> 3)
            + jnp.where(delta & 4, step, 0)
            + jnp.where(delta & 2, step >> 1, 0)
            + jnp.where(delta & 1, step >> 2, 0)
        )
        pred = jnp.clip(
            pred + jnp.where(delta & 8, -vpdiff, vpdiff), -32768, 32767
        )
        idx = jnp.clip(idx + itab[delta], 0, 88)
        return (pred, idx), pred

    _, out = lax.scan(step_fn, (pred0, idx0), nib)
    return out


# IMA/DVI ADPCM step-size and index-adaptation tables (IMA ADPCM
# reference algorithm; WAV format code 0x11).
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], np.int32)
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], np.int32)


@functools.partial(
    jax.jit, static_argnames=("channels", "block_align", "max_frames")
)
def unpack_ima_adpcm(
    bufs: jax.Array,      # u8 [B, N] raw file bytes
    data_off: jax.Array,  # i32 [B] byte offset of the first block
    n_frames: jax.Array,  # i32 [B] valid frame count per file
    *,
    channels: int,
    block_align: int,
    max_frames: int,
) -> jax.Array:
    """Decode WAV IMA ADPCM (format 0x11) → planar f32 [B, max_frames, C].

    Each ``block_align``-byte block is self-contained: a 4-byte header
    per channel (int16 LE predictor = the block's first output sample,
    uint8 step index) followed by 4-byte nibble groups interleaved per
    channel.  That makes blocks the parallel axis — every (file, block,
    channel) is an independent decode lane — and only the 8·W nibbles
    WITHIN a block are sequential: a ``lax.scan`` over nibble position
    runs all ``B·K·C`` lanes per step, the TPU analogue of the MP3
    Huffman lane scan (the bitstream is sequential per lane, lanes are
    data-parallel).  The reference decodes no compressed WAV at all
    (wav.rs:9-28 enumerates format codes and decodes only PCM)."""
    if block_align <= 4 * channels or block_align % (4 * channels):
        raise ValueError(f"bad IMA block_align {block_align}")
    B = bufs.shape[0]
    W = (block_align - 4 * channels) // (4 * channels)  # words/ch/block
    spb = 1 + 8 * W                                     # samples/ch/block
    K = -(-max_frames // spb)                           # blocks
    span = K * block_align
    blocks = _slice_region(bufs, data_off, span).reshape(B, K, block_align)

    hdr = blocks[:, :, : 4 * channels].reshape(B, K, channels, 4)
    pred0 = (
        hdr[..., 0].astype(jnp.int32)
        | (hdr[..., 1].astype(jnp.int32) << 8)
    )
    pred0 = jnp.where(pred0 >= 1 << 15, pred0 - (1 << 16), pred0)
    idx0 = jnp.clip(hdr[..., 2].astype(jnp.int32), 0, 88)

    # body nibbles → [S, lanes] in decode order (low nibble first inside
    # each byte, bytes in order inside each channel's 4-byte group)
    body = blocks[:, :, 4 * channels :].reshape(B, K, W, channels, 4)
    nib = jnp.stack([body & 0xF, body >> 4], axis=-1)   # [B,K,W,C,4,2]
    nib = nib.transpose(0, 1, 3, 2, 4, 5).reshape(B * K * channels, 8 * W)
    nib = nib.T.astype(jnp.int32)                       # [S, lanes]

    out = _ima_scan(pred0.reshape(-1), idx0.reshape(-1), nib)
    samples = jnp.concatenate(
        [pred0.reshape(1, -1), out], axis=0
    )                                                   # [spb, lanes]
    pcm = (
        samples.reshape(spb, B, K, channels)
        .transpose(1, 2, 0, 3)                          # [B, K, spb, C]
        .reshape(B, K * spb * channels)[:, : max_frames * channels]
        .astype(jnp.float32)
        * jnp.float32(1.0 / 32768.0)
    )  # flat interleaved [B, S*C] (AudioBatch device layout)
    ids = jnp.arange(max_frames * channels, dtype=jnp.int32)[None, :]
    return jnp.where(ids // channels < n_frames[:, None], pcm, 0.0)


@functools.partial(
    jax.jit, static_argnames=("channels", "max_frames")
)
def unpack_ima4(
    bufs: jax.Array,      # u8 [B, N] raw file bytes
    data_off: jax.Array,  # i32 [B] byte offset of the first packet group
    n_frames: jax.Array,  # i32 [B] valid frame count per file
    *,
    channels: int,
    max_frames: int,
) -> jax.Array:
    """Decode AIFF-C 'ima4' (Apple/QuickTime IMA) → f32 [B, max_frames, C].

    Fixed 34-byte packets per channel, interleaved by channel per
    64-sample group: a 2-byte BIG-endian header packs the running
    predictor's top 9 bits (sign-extended) with the 7-bit step index,
    then 32 bytes of nibbles (LOW nibble first).  Every packet carries
    its own state header, so packets are independent decode lanes —
    unlike WAV IMA there is no verbatim first sample (all 64 outputs
    come from the nibble scan seeded by the 9-bit predictor)."""
    B = bufs.shape[0]
    group = 34 * channels            # bytes per 64-frame channel group
    K = -(-max_frames // 64)
    span = K * group
    pkts = _slice_region(bufs, data_off, span).reshape(B, K, channels, 34)

    hdr = (pkts[..., 0].astype(jnp.int32) << 8) | pkts[..., 1].astype(
        jnp.int32)
    pred0 = hdr & 0xFF80
    pred0 = jnp.where(pred0 >= 1 << 15, pred0 - (1 << 16), pred0)
    idx0 = jnp.clip(hdr & 0x7F, 0, 88)

    body = pkts[..., 2:]                                  # [B,K,C,32]
    nib = jnp.stack([body & 0xF, body >> 4], axis=-1)     # low first
    nib = nib.reshape(B * K * channels, 64).T.astype(jnp.int32)

    out = _ima_scan(pred0.reshape(-1), idx0.reshape(-1), nib)
    pcm = (
        out.reshape(64, B, K, channels)
        .transpose(1, 2, 0, 3)
        .reshape(B, K * 64 * channels)[:, : max_frames * channels]
        .astype(jnp.float32)
        * jnp.float32(1.0 / 32768.0)
    )  # flat interleaved [B, S*C] (AudioBatch device layout)
    ids = jnp.arange(max_frames * channels, dtype=jnp.int32)[None, :]
    return jnp.where(ids // channels < n_frames[:, None], pcm, 0.0)


# MS ADPCM (WAV format 0x02): the 7 standard predictor coefficient pairs
# and the idelta adaptation table (Microsoft's coding spec; decoders —
# ffmpeg included — use these built-ins regardless of the fmt chunk's
# copy, so files with doctored coefficient lists decode identically).
_MS_COEF1 = np.array([256, 512, 0, 192, 240, 460, 392], np.int32)
_MS_COEF2 = np.array([0, -256, 0, 64, 0, -208, -232], np.int32)
_MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614,
     768, 614, 512, 409, 307, 230, 230, 230], np.int32)


@functools.partial(
    jax.jit, static_argnames=("channels", "block_align", "max_frames")
)
def unpack_ms_adpcm(
    bufs: jax.Array,      # u8 [B, N] raw file bytes
    data_off: jax.Array,  # i32 [B] byte offset of the first block
    n_frames: jax.Array,  # i32 [B] valid frame count per file
    *,
    channels: int,
    block_align: int,
    max_frames: int,
) -> jax.Array:
    """Decode WAV MS ADPCM (format 0x02) → planar f32 [B, max_frames, C].

    Block layout (all per-channel fields interleaved by channel): 1-byte
    predictor index, int16 LE idelta, int16 LE sample1, int16 LE sample2
    — 7 bytes per channel — then one 4-bit code per channel per byte
    (high nibble first).  sample2 then sample1 are the block's first two
    output frames verbatim, so blocks are independent decode lanes like
    IMA's; the scan carries (sample1, sample2, idelta) per lane.
    Arithmetic follows the MS spec exactly: predictor =
    (s1·coef1 + s2·coef2) / 256 truncated TOWARD ZERO (not a >> 8
    floor), then + signed_nibble · idelta, clamped to int16; idelta
    adapts by (ADAPT[nibble] · idelta) >> 8 with a floor of 16."""
    if channels not in (1, 2):
        raise ValueError("MS ADPCM: 1 or 2 channels")
    if block_align <= 7 * channels:
        raise ValueError(f"bad MS block_align {block_align}")
    B = bufs.shape[0]
    body_n = block_align - 7 * channels
    S = body_n * 2 // channels          # coded samples per channel
    spb = 2 + S
    K = -(-max_frames // spb)
    span = K * block_align
    blocks = _slice_region(bufs, data_off, span).reshape(B, K, block_align)

    def i16(lo, hi):
        v = lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 8)
        return jnp.where(v >= 1 << 15, v - (1 << 16), v)

    C = channels
    hdr = blocks[:, :, : 7 * C]
    cidx = jnp.clip(hdr[:, :, 0:C].astype(jnp.int32), 0, 6)   # [B,K,C]
    idelta0 = i16(hdr[:, :, C : 3 * C : 2], hdr[:, :, C + 1 : 3 * C : 2])
    samp1 = i16(hdr[:, :, 3 * C : 5 * C : 2], hdr[:, :, 3 * C + 1 : 5 * C : 2])
    samp2 = i16(hdr[:, :, 5 * C : 7 * C : 2], hdr[:, :, 5 * C + 1 : 7 * C : 2])

    body = blocks[:, :, 7 * C :]                              # [B,K,body_n]
    nib = jnp.stack([body >> 4, body & 0xF], axis=-1)         # hi first
    # stereo: byte k carries (left, right); mono: two consecutive codes
    nib = nib.reshape(B, K, S, C).transpose(0, 1, 3, 2)       # [B,K,C,S]
    nib = nib.reshape(B * K * C, S).T.astype(jnp.int32)       # [S, lanes]

    coef1 = jnp.asarray(_MS_COEF1)[cidx].reshape(-1)
    coef2 = jnp.asarray(_MS_COEF2)[cidx].reshape(-1)
    adapt = jnp.asarray(_MS_ADAPT)

    def trunc_div256(x):
        return jnp.where(x < 0, -((-x) >> 8), x >> 8)

    def step_fn(carry, nb):
        s1, s2, delta = carry
        signed = nb - ((nb & 8) << 1)
        pred = trunc_div256(s1 * coef1 + s2 * coef2) + signed * delta
        pred = jnp.clip(pred, -32768, 32767)
        delta = jnp.maximum((adapt[nb] * delta) >> 8, 16)
        return (pred, s1, delta), pred

    # the header idelta is used RAW for the first code (the 16 floor
    # applies only after adaptation — ffmpeg/MS-spec behavior)
    init = (samp1.reshape(-1), samp2.reshape(-1), idelta0.reshape(-1))
    _, out = lax.scan(step_fn, init, nib)                     # [S, lanes]
    samples = jnp.concatenate(
        [samp2.reshape(1, -1), samp1.reshape(1, -1), out], axis=0
    )                                                         # [spb, lanes]
    pcm = (
        samples.reshape(spb, B, K, C)
        .transpose(1, 2, 0, 3)
        .reshape(B, K * spb * C)[:, : max_frames * C]
        .astype(jnp.float32)
        * jnp.float32(1.0 / 32768.0)
    )  # flat interleaved [B, S*C] (AudioBatch device layout)
    ids = jnp.arange(max_frames * C, dtype=jnp.int32)[None, :]
    return jnp.where(ids // C < n_frames[:, None], pcm, 0.0)
