"""Codec model families — THE decode dispatch surface.

Each supported container/codec family is a "model": a host-side probe,
an optional native front-end, and a jitted device decode program, bound
here as a real ``decode_group`` callable.  ``codecs.registry`` routes
every asset through this table (extension → model → decode_group), so
there is exactly one dispatch surface (≙ the extension match of the
reference's entry loop, blast/src/main.rs:38-77).

Families:
  wav  — RIFF/WAVE: vectorized chunk parse + fused PCM unpack (8/16/24/32
         bit + IEEE float + A/µ-law), little-endian (codecs/wav.py).
  aiff — FORM/AIFF: big-endian PCM + IEEE-80 rates, AIFF-C codecs
         (codecs/aiff.py).
  au   — Sun AU / NeXT SND: fixed BE header, G.711 + PCM + float
         encodings (codecs/au.py).
  mp3  — MPEG-1/2/2.5 Layers I/II/III: host frame/side-info walk (C++
         mp3fe or pure Python) + full on-device entropy decode and
         synthesis (codecs/mpeg/) — the reference's decode TODO,
         completed; layer-routed automatically, so a .mp3-named Layer II
         stream still decodes.
  flac — FLAC lossless: host structural walk (frame/subframe/partition
         boundaries only) + fused on-device rice scan, exact integer
         LPC/FIXED reconstruction, stereo decorrelation (codecs/flac/).
         Beyond-reference family; bit-exact by construction.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

from ..codecs import registry as _registry
from ..codecs.flac import decoder as _flac
from ..codecs.mpeg import decoder as _mpeg


@dataclasses.dataclass(frozen=True)
class CodecModel:
    """One decode family: name, extensions, group decoder.

    ``decode_group(assets) -> [(family_local_indices, AudioBatch), ...]``
    — the same piece contract every family decoder returns."""

    name: str
    extensions: tuple
    decode_group: Callable
    bit_exact: bool  # PCM bit-exactness (vs spec-tolerance) guarantee


MODELS = {
    "wav": CodecModel(
        name="wav", extensions=("wav",),
        decode_group=functools.partial(_registry.decode_pcm_family, "wav"),
        bit_exact=True,
    ),
    "aiff": CodecModel(
        name="aiff", extensions=("aif", "aiff", "aifc"),
        decode_group=functools.partial(_registry.decode_pcm_family, "aiff"),
        bit_exact=True,
    ),
    "au": CodecModel(
        name="au", extensions=("au", "snd"),
        decode_group=functools.partial(_registry.decode_pcm_family, "au"),
        bit_exact=True,
    ),
    "caf": CodecModel(
        name="caf", extensions=("caf",),
        decode_group=functools.partial(_registry.decode_pcm_family, "caf"),
        bit_exact=True,
    ),
    "mp3": CodecModel(
        name="mp3", extensions=("mp3", "mp2", "mp1"),
        decode_group=_mpeg.decode_group,
        bit_exact=False,  # ISO spec tolerance (validated vs mpg123)
    ),
    "flac": CodecModel(
        name="flac", extensions=("flac",),
        decode_group=_flac.decode_group,
        bit_exact=True,  # lossless codec, exact integer reconstruction
    ),
}


def for_extension(ext: str) -> CodecModel | None:
    for m in MODELS.values():
        if ext.lower() in m.extensions:
            return m
    return None


__all__ = ["CodecModel", "MODELS", "for_extension"]
