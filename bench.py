#!/usr/bin/env python
"""Benchmark: decoded audio-seconds per second per chip.

Metric per BASELINE.json: throughput of the batched decode pipeline on the
attached chip, in decoded audio-sec/sec (the reference's implied number is
~1× real-time per process — it decodes at load time and renders in real
time; see BASELINE.md).  ``vs_baseline`` is therefore the raw real-time
multiple.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload today: batch of 16-bit stereo 44.1 kHz WAVs (the reference's only
working decode path).  The mixed WAV+MP3 batch lands with the MP3 decoder.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _make_wav_blob(rng, seconds: float, rate: int = 44100, channels: int = 2) -> bytes:
    import struct

    frames = int(seconds * rate)
    pcm = rng.integers(-32768, 32768, size=(frames, channels)).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audio_decoder_tpu.io.assets import pack_bytes
    from audio_decoder_tpu.parallel.decode import decode_pcm_step

    rng = np.random.default_rng(7)
    n_files = 32
    seconds = 10.0
    rate = 44100

    blobs = [_make_wav_blob(rng, seconds, rate) for _ in range(n_files)]
    bufs_np, lens_np = pack_bytes(blobs)
    bufs = jax.device_put(jnp.asarray(bufs_np))
    lens = jax.device_put(jnp.asarray(lens_np))
    max_frames = int(seconds * rate)

    def run():
        pcm, meta = decode_pcm_step(
            bufs, lens, bits=16, channels=2, max_frames=max_frames, family="wav"
        )
        return pcm, meta["n_frames"], meta["err"]

    # Warmup / compile.
    pcm, n_frames, err = run()
    jax.block_until_ready(pcm)
    assert int(np.asarray(err).sum()) == 0, "bench batch failed to decode"
    audio_sec = float(np.asarray(n_frames).sum()) / rate

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        pcm, n_frames, err = run()
    jax.block_until_ready(pcm)
    dt = time.perf_counter() - t0

    value = audio_sec * iters / dt
    print(
        json.dumps(
            {
                "metric": "decoded_audio_sec_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "audio_sec/sec",
                "vs_baseline": round(value, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
