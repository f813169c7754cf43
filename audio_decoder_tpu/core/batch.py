"""Batched audio containers.

The reference decodes one file at a time into an ``AudioFile`` of interleaved
``i16`` PCM (blast/src/file_parsing/decode_helpers.rs:17-38).  A TPU-native
pipeline instead decodes a *batch* of files at once, so the unified container
here is ``AudioBatch``: a padded ``[B, S, C]`` float32 PCM tensor plus
per-file metadata arrays.  f32 (instead of the reference's i16) is a
deliberate upgrade — 16-bit sources remain bit-exact under the
``i16 / 32768.0`` mapping, and higher bit depths don't lose precision.

``AudioBatch`` is a registered pytree so it can flow through ``jax.jit`` /
``pjit`` unchanged; string metadata (names, formats) rides along as static
aux data.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AudioBatch:
    """A batch of decoded audio files (device-resident).

    Attributes:
      pcm: f32 ``[B, S, C]`` — zero-padded planar PCM in [-1, 1).  16-bit
        sources map bit-exactly via ``i16 / 32768``.
      sample_rate: i32 ``[B]`` — per-file sample rate in Hz
        (≙ AudioFile.sample_rate, decode_helpers.rs:21).
      num_channels: i32 ``[B]`` — valid channels per file (≤ C).
      bits_per_sample: i32 ``[B]`` — source bit depth
        (≙ AudioFile.bits_per_sample, decode_helpers.rs:23).
      valid_frames: i32 ``[B]`` — unpadded frame count per file.
      err: i32 ``[B]`` — per-file decode error code (see core.errors).
      names: static tuple of file stems (≙ AudioFile.file_name).
      formats: static tuple of source formats ("wav"/"aiff"/"mp3").
    """

    pcm: jax.Array
    sample_rate: jax.Array
    num_channels: jax.Array
    bits_per_sample: jax.Array
    valid_frames: jax.Array
    err: jax.Array
    names: tuple = dataclasses.field(metadata=dict(static=True), default=())
    formats: tuple = dataclasses.field(metadata=dict(static=True), default=())

    @property
    def batch_size(self) -> int:
        return self.pcm.shape[0]

    @property
    def max_frames(self) -> int:
        return self.pcm.shape[1]

    @property
    def max_channels(self) -> int:
        return self.pcm.shape[2]

    def audio_seconds(self) -> jax.Array:
        """Total decoded (unpadded) audio duration in seconds."""
        ok = self.err == 0
        dur = self.valid_frames / jnp.maximum(self.sample_rate, 1)
        return jnp.sum(jnp.where(ok, dur, 0.0))

    def file(self, i: int) -> "AudioFileView":
        """Host-side single-file view (trims padding), for tests/CLI."""
        frames = int(self.valid_frames[i])
        ch = int(self.num_channels[i])
        return AudioFileView(
            file_name=self.names[i] if i < len(self.names) else str(i),
            format=self.formats[i] if i < len(self.formats) else "",
            sample_rate=int(self.sample_rate[i]),
            num_channels=ch,
            bits_per_sample=int(self.bits_per_sample[i]),
            pcm=np.asarray(self.pcm[i, :frames, :ch]),
            err=int(self.err[i]),
        )


@dataclasses.dataclass
class AudioFileView:
    """Host-side view of one decoded file — the reference's ``AudioFile``
    (decode_helpers.rs:17-38) with f32 planar PCM."""

    file_name: str
    format: str
    sample_rate: int
    num_channels: int
    bits_per_sample: int
    pcm: np.ndarray  # f32 [frames, channels]
    err: int = 0

    @property
    def interleaved_i16(self) -> np.ndarray:
        """Interleaved i16 PCM, the reference's sample layout
        (decode_helpers.rs:24: ``samples: Vec<i16>``)."""
        x = np.clip(np.round(self.pcm * 32768.0), -32768, 32767)
        return x.astype(np.int16).reshape(-1)


def concat_batches(batches: Sequence[AudioBatch]) -> AudioBatch:
    """Concatenate decode-group results back into one batch (host order)."""
    smax = max(b.max_frames for b in batches)
    cmax = max(b.max_channels for b in batches)
    pcms = []
    for b in batches:
        pad = [(0, 0), (0, smax - b.max_frames), (0, cmax - b.max_channels)]
        pcms.append(jnp.pad(b.pcm, pad))
    return AudioBatch(
        pcm=jnp.concatenate(pcms, axis=0),
        sample_rate=jnp.concatenate([b.sample_rate for b in batches]),
        num_channels=jnp.concatenate([b.num_channels for b in batches]),
        bits_per_sample=jnp.concatenate([b.bits_per_sample for b in batches]),
        valid_frames=jnp.concatenate([b.valid_frames for b in batches]),
        err=jnp.concatenate([b.err for b in batches]),
        names=sum((tuple(b.names) for b in batches), ()),
        formats=sum((tuple(b.formats) for b in batches), ()),
    )
