"""Batched audio containers.

The reference decodes one file at a time into an ``AudioFile`` of interleaved
``i16`` PCM (blast/src/file_parsing/decode_helpers.rs:17-38).  A TPU-native
pipeline instead decodes a *batch* of files at once, so the unified container
here is ``AudioBatch``: a padded interleaved float32 PCM tensor plus per-file
metadata arrays.  f32 (instead of the reference's i16) is a deliberate
upgrade — 16-bit sources remain bit-exact under the ``i16 / 32768.0``
mapping, and higher bit depths don't lose precision.

Device layout: PCM is stored FLAT interleaved, ``data: f32 [B, S*C]`` with a
static channel count, NOT ``[B, S, C]``.  TPU arrays tile their last two
dims to (8, 128); a trailing channel dim of 1-2 pads every 128-lane tile to
1-2 used elements — a 64-128x HBM and write-bandwidth tax on every decoded
batch, and an OOM cliff (16 stereo 30 s files @44.1 kHz would "occupy" 16 GB).
The flat layout is byte-identical to the unpadded ``[B, S, C]`` C-order
array, so the 3-D view is free on the host (``np.reshape``) and exposed via
the ``pcm`` property for convenience/tests; hot device paths read ``data``.

``AudioBatch`` is a registered pytree so it can flow through ``jax.jit`` /
``pjit`` unchanged; string metadata (names, formats) and the channel count
ride along as static aux data.
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
      data: f32 ``[B, S*C]`` — zero-padded flat interleaved PCM in [-1, 1).
        16-bit sources map bit-exactly via ``i16 / 32768``.  See the module
        docstring for why the device layout is flat, not ``[B, S, C]``.
      sample_rate: i32 ``[B]`` — per-file sample rate in Hz
        (≙ AudioFile.sample_rate, decode_helpers.rs:21).
      num_channels: i32 ``[B]`` — valid channels per file (≤ C).
      bits_per_sample: i32 ``[B]`` — source bit depth
        (≙ AudioFile.bits_per_sample, decode_helpers.rs:23).
      valid_frames: i32 ``[B]`` — unpadded frame count per file.
      err: i32 ``[B]`` — per-file decode error code (see core.errors).
      names: static tuple of file stems (≙ AudioFile.file_name).
      formats: static tuple of source formats ("wav"/"aiff"/"mp3"/...).
      channels: static storage channel count C of the interleaving.
    """

    data: jax.Array
    sample_rate: jax.Array
    num_channels: jax.Array
    bits_per_sample: jax.Array
    valid_frames: jax.Array
    err: jax.Array
    names: tuple = dataclasses.field(metadata=dict(static=True), default=())
    formats: tuple = dataclasses.field(metadata=dict(static=True), default=())
    channels: int = dataclasses.field(metadata=dict(static=True), default=1)

    @classmethod
    def from_pcm(cls, pcm, **kw) -> "AudioBatch":
        """Build from a planar ``[B, S, C]`` PCM tensor (convenience for
        tests/host callers; flattening is free in C order)."""
        B, _S, C = pcm.shape
        return cls(data=jnp.reshape(pcm, (B, -1)), channels=int(C), **kw)

    @property
    def pcm(self) -> jax.Array:
        """Planar ``[B, S, C]`` view of ``data``.

        Free on CPU/host; on TPU this materializes the tile-padded 3-D
        layout — prefer ``data`` in device-side hot paths."""
        B, SC = self.data.shape
        return self.data.reshape(B, SC // self.channels, self.channels)

    @property
    def batch_size(self) -> int:
        return self.data.shape[0]

    @property
    def max_frames(self) -> int:
        return self.data.shape[1] // self.channels

    @property
    def max_channels(self) -> int:
        return self.channels

    def audio_seconds(self) -> jax.Array:
        """Total decoded (unpadded) audio duration in seconds."""
        ok = self.err == 0
        dur = self.valid_frames / jnp.maximum(self.sample_rate, 1)
        return jnp.sum(jnp.where(ok, dur, 0.0))

    def file(self, i: int) -> "AudioFileView":
        """Host-side single-file view (trims padding), for tests/CLI."""
        frames = int(self.valid_frames[i])
        ch = int(self.num_channels[i])
        C = self.channels
        # fetch the flat row (no device relayout), reshape on host for free
        row = np.asarray(self.data[i, : frames * C]).reshape(frames, C)
        return AudioFileView(
            file_name=self.names[i] if i < len(self.names) else str(i),
            format=self.formats[i] if i < len(self.formats) else "",
            sample_rate=int(self.sample_rate[i]),
            num_channels=ch,
            bits_per_sample=int(self.bits_per_sample[i]),
            pcm=row[:, :ch],
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


def expand_flat(data: jax.Array, channels: int, smax: int,
                cmax: int) -> jax.Array:
    """Re-interleave flat ``[B, S*C]`` PCM into flat ``[B, smax*cmax]``.

    One flat gather — never materializes a tile-padded ``[B, S, C]``
    intermediate on device (zero-fills both the added channels and the
    added frames)."""
    B, SC = data.shape
    S = SC // channels
    pos = jnp.arange(smax * cmax, dtype=jnp.int32)
    frame, ch = pos // cmax, pos % cmax
    ok = (ch < channels) & (frame < S)
    src = jnp.where(ok, frame * channels + ch, 0)
    return jnp.where(ok[None, :], data[:, src], 0.0)


def concat_batches(batches: Sequence[AudioBatch]) -> AudioBatch:
    """Concatenate decode-group results back into one batch (host order)."""
    smax = max(b.max_frames for b in batches)
    cmax = max(b.max_channels for b in batches)
    rows = []
    for b in batches:
        if b.channels == cmax:
            # frames-only mismatch: interleaving is unchanged, so the
            # extension is a contiguous zero suffix — no gather needed
            pad = smax * cmax - b.data.shape[1]
            rows.append(jnp.pad(b.data, ((0, 0), (0, pad))) if pad
                        else b.data)
        else:
            rows.append(expand_flat(b.data, b.channels, smax, cmax))
    return AudioBatch(
        data=jnp.concatenate(rows, axis=0),
        channels=cmax,
        sample_rate=jnp.concatenate([b.sample_rate for b in batches]),
        num_channels=jnp.concatenate([b.num_channels for b in batches]),
        bits_per_sample=jnp.concatenate([b.bits_per_sample for b in batches]),
        valid_frames=jnp.concatenate([b.valid_frames for b in batches]),
        err=jnp.concatenate([b.err for b in batches]),
        names=sum((tuple(b.names) for b in batches), ()),
        formats=sum((tuple(b.formats) for b in batches), ()),
    )
