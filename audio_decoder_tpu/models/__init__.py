"""Codec model families — the decode-model registry.

Each supported container/codec family is a "model": a host-side probe,
an optional native front-end, and a jitted device decode program.  This
module is the stable lookup surface over them (the extension dispatch in
``codecs.registry`` routes through the same implementations).

Families:
  wav  — RIFF/WAVE: vectorized chunk parse + fused PCM unpack (8/16/24/32
         bit + IEEE float), little-endian (codecs/wav.py).
  aiff — FORM/AIFF: big-endian PCM + IEEE-80 rates (codecs/aiff.py).
  mp3  — MPEG-1/2/2.5 Layer III: host frame/side-info walk (C++ mp3fe or
         pure Python) + full on-device entropy decode and synthesis
         (codecs/mpeg/) — the reference's decode TODO, completed.
  mp2/mp1 — MPEG Layers II and I: host fixed-width subband parse +
         jitted requantize feeding the same polyphase synthesis
         (codecs/mpeg/layer12.py); layer-routed automatically, so a
         .mp3-named Layer II stream still decodes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from ..codecs.mpeg import decoder as _mpeg


@dataclasses.dataclass(frozen=True)
class CodecModel:
    """One decode family: name, extensions, group decoder."""

    name: str
    extensions: tuple
    decode_group: Callable
    bit_exact: bool  # PCM bit-exactness (vs spec-tolerance) guarantee


MODELS = {
    "wav": CodecModel(
        name="wav", extensions=("wav",),
        decode_group=None,  # PCM families decode via codecs.registry
        bit_exact=True,
    ),
    "aiff": CodecModel(
        name="aiff", extensions=("aif", "aiff"),
        decode_group=None,
        bit_exact=True,
    ),
    "mp3": CodecModel(
        name="mp3", extensions=("mp3", "mp2", "mp1"),
        decode_group=_mpeg.decode_group,
        bit_exact=False,  # ISO spec tolerance (validated vs mpg123)
    ),
}


def for_extension(ext: str) -> CodecModel | None:
    for m in MODELS.values():
        if ext.lower() in m.extensions:
            return m
    return None


__all__ = ["CodecModel", "MODELS", "for_extension"]
