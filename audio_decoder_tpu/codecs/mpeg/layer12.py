"""MPEG Layer I / Layer II decode: host bitstream parse + device DSP.

Layers I and II are subband coders: fixed-width sample codes (widths set
by the per-subband bit allocation) feed the same polyphase synthesis
filterbank as Layer III — no entropy coding, no reservoir, no IMDCT.  The
host walks allocation/scfsi/scalefactors/codes (fixed-size reads only)
and emits dense tensors; requantization and synthesis run as one jitted
batch-parallel program (`l12_synthesize`), sharing
``dsp.polyphase_synthesis`` with Layer III.

Completes the remaining layers of the reference's decode TODO — its
mpeg.rs frames Layer I/II/III headers (bitrate table mpeg.rs:255-271) but
decodes none.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core import errors as E
from . import layer12_tables as LT
from .frontend import _Bits, find_frames
from .dsp import polyphase_synthesis

#: quantization classes: steps → (class id, nb); class 0 = silent
_STEPS_LIST = (0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
               8191, 16383, 32767, 65535)
_CLASS_BY_STEPS = {s: i for i, s in enumerate(_STEPS_LIST)}
_NB_BY_CLASS = np.array(
    [1] + [int(s).bit_length() for s in _STEPS_LIST[1:]], np.int32
)
_C_BY_CLASS = np.array(
    [0.0] + [LT.CD[s][0] for s in _STEPS_LIST[1:]], np.float64
)
_D_BY_CLASS = np.array(
    [0.0] + [LT.CD[s][1] for s in _STEPS_LIST[1:]], np.float64
)
_SF = LT.scalefactors()  # [63]


def _select_table(version: int, sr: int, bitrate: int, channels: int):
    if version != 3:
        return LT.ALLOC_TABLES[4], LT.SBLIMIT[4]
    from . import tables as T

    sfreq = {44100: 0, 48000: 1, 32000: 2}[sr]
    col = T.bitrate_column(version, 2)
    br_idx = 0
    for i in range(14):
        if int(T.BITRATE_KBPS[i][col]) * 1000 == bitrate:
            br_idx = i + 1
            break
    t = LT.TRANSLATE[sfreq][2 - channels][br_idx]
    return LT.ALLOC_TABLES[t], LT.SBLIMIT[t]


@dataclasses.dataclass
class L12Analysis:
    """Dense host output for one Layer I/II file."""

    sample_rate: int
    channels: int
    layer: int  # 1 or 2
    n_frames: int
    steps_per_frame: int  # 12 (Layer I) or 36 (Layer II)
    codes: np.ndarray  # int32 [F, C, 32, steps]
    cls: np.ndarray  # int8  [F, C, 32] quantization class (0 silent)
    sf_idx: np.ndarray  # int8 [F, C, 32, 3] scalefactor index (63 silent)


def analyze_l2(blob: bytes, frames=None) -> L12Analysis:
    """`frames` (optional): precomputed ``[(pos, header), ...]`` into
    `blob` — lets a streaming caller re-analyze a byte slice with exact
    framing instead of re-running the sync walk on the slice."""
    if frames is None:
        frames = [(p, h) for p, h in find_frames(blob) if h["layer"] == 2]
    if not frames:
        raise E.InvalidDataError("no Layer II frames")
    h0 = frames[0][1]
    sr, ch, ver = h0["sr"], h0["channels"], h0["version"]
    frames = [
        (p, h) for p, h in frames
        if h["sr"] == sr and h["channels"] == ch and h["version"] == ver
    ]
    F = len(frames)
    codes = np.zeros((F, ch, 32, 36), np.int32)
    cls = np.zeros((F, ch, 32), np.int8)
    sf_idx = np.full((F, ch, 32, 3), 63, np.int8)

    for fi, (pos, h) in enumerate(frames):
        try:
            table, sblimit = _select_table(ver, sr, h["bitrate"], ch)
            bound = (
                min((h["mode_ext"] + 1) * 4, sblimit)
                if h["mode"] == 1 else sblimit
            )
            bits = _Bits(
                blob[pos + 4 + (2 if h["crc"] else 0) : pos + h["frame_len"]]
            )
            alloc = np.zeros((ch, 32), np.int32)
            for sb in range(sblimit):
                width = table[sb][0]
                if sb < bound:
                    for c in range(ch):
                        alloc[c, sb] = bits.get(width)
                else:
                    a = bits.get(width)
                    alloc[:, sb] = a
            scfsi = np.zeros((ch, 32), np.int32)
            for sb in range(sblimit):
                for c in range(ch):
                    if alloc[c, sb]:
                        scfsi[c, sb] = bits.get(2)
            for sb in range(sblimit):
                for c in range(ch):
                    if not alloc[c, sb]:
                        continue
                    m = scfsi[c, sb]
                    if m == 0:
                        idx = [bits.get(6) for _ in range(3)]
                    elif m == 1:
                        a, b = bits.get(6), bits.get(6)
                        idx = [a, a, b]
                    elif m == 2:
                        a = bits.get(6)
                        idx = [a, a, a]
                    else:
                        a, b = bits.get(6), bits.get(6)
                        idx = [a, b, b]
                    sf_idx[fi, c, sb] = [min(i, 62) for i in idx]
            for gr in range(12):
                for sb in range(sblimit):
                    shared = sb >= bound
                    for c in range(1 if shared else ch):
                        a = alloc[c, sb]
                        if not a:
                            continue
                        sample_bits, d = table[sb][1][a - 1]
                        if d > 0:  # grouped triplet
                            g = bits.get(sample_bits)
                            vals = (g % d, (g // d) % d, (g // d**2) % d)
                            steps = d
                        else:
                            steps = (1 << sample_bits) - 1
                            vals = tuple(
                                bits.get(sample_bits) for _ in range(3)
                            )
                        klass = _CLASS_BY_STEPS[steps]
                        targets = range(ch) if shared else (c,)
                        for cc in targets:
                            if shared and not alloc[cc, sb]:
                                continue
                            cls[fi, cc, sb] = klass
                            for k in range(3):
                                codes[fi, cc, sb, gr * 3 + k] = vals[k]
        except (IndexError, E.DecodeError):
            cls[fi] = 0  # silent frame
            codes[fi] = 0
    return L12Analysis(
        sample_rate=sr, channels=ch, layer=2, n_frames=F,
        steps_per_frame=36, codes=codes, cls=cls, sf_idx=sf_idx,
    )


def analyze_l1(blob: bytes, frames=None) -> L12Analysis:
    """`frames`: see analyze_l2 — precomputed framing for slice re-analysis."""
    if frames is None:
        frames = [(p, h) for p, h in find_frames(blob) if h["layer"] == 3]
    if not frames:
        raise E.InvalidDataError("no Layer I frames")
    h0 = frames[0][1]
    sr, ch, ver = h0["sr"], h0["channels"], h0["version"]
    frames = [
        (p, h) for p, h in frames
        if h["sr"] == sr and h["channels"] == ch and h["version"] == ver
    ]
    F = len(frames)
    codes = np.zeros((F, ch, 32, 12), np.int32)
    cls = np.zeros((F, ch, 32), np.int8)
    sf_idx = np.full((F, ch, 32, 3), 63, np.int8)
    for fi, (pos, h) in enumerate(frames):
        try:
            bound = min((h["mode_ext"] + 1) * 4, 32) if h["mode"] == 1 else 32
            bits = _Bits(
                blob[pos + 4 + (2 if h["crc"] else 0) : pos + h["frame_len"]]
            )
            alloc = np.zeros((ch, 32), np.int32)
            for sb in range(32):
                if sb < bound:
                    for c in range(ch):
                        alloc[c, sb] = bits.get(4)
                else:
                    alloc[:, sb] = bits.get(4)
            for sb in range(32):
                for c in range(ch):
                    if alloc[c, sb]:
                        sf_idx[fi, c, sb] = min(bits.get(6), 62)
            for t in range(12):
                for sb in range(32):
                    shared = sb >= bound
                    for c in range(1 if shared else ch):
                        a = alloc[c, sb]
                        if not a:
                            continue
                        nb = a + 1
                        v = bits.get(nb)
                        steps = (1 << nb) - 1
                        klass = _CLASS_BY_STEPS[steps]
                        for cc in range(ch) if shared else (c,):
                            if shared and not alloc[cc, sb]:
                                continue
                            cls[fi, cc, sb] = klass
                            codes[fi, cc, sb, t] = v
        except (IndexError, E.DecodeError):
            cls[fi] = 0
            codes[fi] = 0
    return L12Analysis(
        sample_rate=sr, channels=ch, layer=1, n_frames=F,
        steps_per_frame=12, codes=codes, cls=cls, sf_idx=sf_idx,
    )


@functools.partial(jax.jit, static_argnames=("channels", "steps"))
def l12_synthesize(
    codes: jax.Array,
    cls: jax.Array,
    sf_idx: jax.Array,
    *,
    channels: int,
    steps: int,
) -> jax.Array:
    """Requantize + polyphase synthesis for a Layer I/II batch.

    codes: int32 ``[B, F, C, 32, steps]``; cls int8 ``[B, F, C, 32]``;
    sf_idx int8 ``[B, F, C, 32, 3]`` (3 scalefactor parts; Layer I uses
    part 0).  Returns f32 PCM ``[B, F*steps*32, C]``.
    """
    B, F, C, _, S = codes.shape
    f = jnp.float32
    nb = jnp.asarray(_NB_BY_CLASS)[cls.astype(jnp.int32)]  # [B,F,C,32]
    cc = jnp.asarray(_C_BY_CLASS, f)[cls.astype(jnp.int32)]
    dd = jnp.asarray(_D_BY_CLASS, f)[cls.astype(jnp.int32)]
    # s'' = C * (code / 2^(nb-1) - 1 + D)   (ISO 2.4.3.2 / 2.4.3.3)
    frac = codes.astype(f) / jnp.exp2((nb - 1).astype(f))[..., None] - 1.0
    s2 = cc[..., None] * (frac + dd[..., None])
    # scalefactor per time step: Layer II parts of 12 samples, Layer I part 0
    sf_tab = jnp.concatenate([jnp.asarray(_SF, f), jnp.zeros((1,), f)])
    sf = sf_tab[sf_idx.astype(jnp.int32)]  # [B,F,C,32,3]
    part = jnp.arange(S) // 12 if S == 36 else jnp.zeros((S,), jnp.int32)
    sf_t = jnp.take_along_axis(
        sf, jnp.broadcast_to(part, (B, F, C, 32, S)).astype(jnp.int32) % 3, -1
    )
    silent = (cls == 0)[..., None]
    sub = jnp.where(silent, 0.0, s2 * sf_t)  # [B,F,C,32,steps]
    TS = sub.transpose(0, 2, 1, 4, 3).reshape(B, C, F * S, 32)
    return polyphase_synthesis(TS)
