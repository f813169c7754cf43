"""Double-buffered streaming decode over large asset sets.

SURVEY §7's io layer calls for host↔device streaming: when decoding more
files than fit one batch, host work (file reads, byte packing, MP3
frame/side-info analysis) for chunk k+1 overlaps device decode of chunk k
— a background thread prepares assets while the caller consumes batches.

The per-chunk decode itself is `codecs.registry.decode_assets`, so the
stream yields the same `AudioBatch` objects as the one-shot API.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Sequence

from ..core.batch import AudioBatch
from .assets import Asset, load_assets


def stream_decode(
    paths: Sequence[str],
    files_per_batch: int = 16,
    prefetch: int = 2,
) -> Iterator[tuple[list[str], AudioBatch]]:
    """Decode paths in chunks, prefetching host work in the background.

    Yields (chunk_paths, AudioBatch) in order.  `prefetch` bounds how many
    prepared chunks may queue ahead of the consumer (host memory bound).
    """
    from ..codecs.registry import decode_assets

    chunks = [
        list(paths[i : i + files_per_batch])
        for i in range(0, len(paths), files_per_batch)
    ]
    q: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
    stop = threading.Event()

    def loader():
        try:
            for chunk in chunks:
                if stop.is_set():
                    return
                try:
                    assets = load_assets(chunk)
                except OSError as e:
                    q.put(("err", chunk, e))
                    continue
                q.put(("ok", chunk, assets))
        finally:
            q.put(("done", None, None))

    t = threading.Thread(target=loader, daemon=True)
    t.start()
    try:
        while True:
            kind, chunk, payload = q.get()
            if kind == "done":
                return
            if kind == "err":
                raise payload
            yield chunk, decode_assets(payload)
    finally:
        stop.set()


def stream_file(
    path: str, granules_per_chunk: int = 512, start_sample: int = 0,
    frames_per_chunk: int = 128, pcm_frames_per_chunk: int = 1 << 17,
    flac_frames_per_chunk: int = 64,
) -> Iterator["np.ndarray"]:
    """Chunked decode of ONE long MPEG audio file (any layer): yields
    float32 [samples, channels] chunks with bounded device memory and a
    single compiled shape regardless of file length
    (codecs.mpeg.decoder.mpeg_stream — Layer III rides Mp3Stream, Layers
    I/II ride L12Stream; concatenated output is bit-identical to the
    one-shot decode).  `start_sample` seeks: output begins exactly at
    that sample of the one-shot decode.  FLAC rides
    codecs.flac.stream.FlacStream (frames are independent, so fixed
    frame windows chunk exactly with no warm-up).  WAV/AIFF files ride
    codecs.pcm_stream.PcmStream: the file is memory-mapped and unpacked
    in fixed frame windows (`pcm_frames_per_chunk`) through the batch
    path's device kernel, so host AND device memory stay O(chunk) even
    for multi-hour PCM files."""
    from ..codecs.mpeg.decoder import mpeg_stream

    ext = path.rsplit(".", 1)[-1].lower()
    if ext in ("mp3", "mp2", "mp1"):
        with open(path, "rb") as fh:
            data = fh.read()
        st = mpeg_stream(data, granules_per_chunk=granules_per_chunk,
                         frames_per_chunk=frames_per_chunk)
        yield from st.chunks(start_sample=start_sample)
        return
    if ext == "flac":
        from ..codecs.flac.stream import FlacStream

        with open(path, "rb") as fh:
            data = fh.read()
        st = FlacStream(data, frames_per_chunk=flac_frames_per_chunk)
        yield from st.chunks(start_sample=start_sample)
        return
    from ..codecs.pcm_stream import PcmStream

    yield from PcmStream(path, frames_per_chunk=pcm_frames_per_chunk).chunks(
        start_sample=start_sample)


def decode_all(paths: Sequence[str], files_per_batch: int = 16) -> AudioBatch:
    """Stream-decode everything and concatenate into one AudioBatch."""
    import jax.numpy as jnp

    from ..core.batch import concat_batches

    batches = [b for _, b in stream_decode(paths, files_per_batch)]
    if not batches:
        z = jnp.zeros((0,), jnp.int32)
        return AudioBatch(
            data=jnp.zeros((0, 1), jnp.float32), sample_rate=z,
            num_channels=z, bits_per_sample=z, valid_frames=z, err=z,
        )
    return concat_batches(batches)
