#!/usr/bin/env python
"""FLAC decode throughput probe on the attached chip.

Stages timed separately: host structural walk (frontend.analyze), lane
packing (decoder.pack_group), fused device decode, and the device→host
PCM fetch — so the binding constraint is visible, the same methodology
as the MP3 numbers in docs/PERFORMANCE.md.

Content knob: music-like (realistic rice parameters) or noise
(incompressible worst case).  Run: python tools/flac_perf_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if os.environ.get("PROBE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PROBE_PLATFORM"])

    from audio_decoder_tpu.codecs.flac import decoder as FD
    from audio_decoder_tpu.codecs.flac import frontend as FF
    from audio_decoder_tpu.codecs.flac.device import flac_decode_batch
    from audio_decoder_tpu.codecs.flac.encode import encode_flac

    n_files = int(os.environ.get("PROBE_FILES", "16"))
    seconds = float(os.environ.get("PROBE_SECS", "10"))
    rate = 44100
    S = int(seconds * rate)
    rng = np.random.default_rng(5)

    t = np.arange(S) / rate
    blobs = {}
    m = np.zeros(S)
    for f0, a in ((110.0, 0.35), (220.5, 0.2), (331.1, 0.12), (442.3, 0.06)):
        m += a * np.sin(2 * np.pi * f0 * t) * np.exp(-0.2 * t)
    m = m + 0.002 * rng.standard_normal(S)
    music = np.clip(np.stack([m, 0.8 * m], 1) * 20000, -32768, 32767)
    blobs["music"] = encode_flac(
        music.astype(np.float32) / 2.0 ** 15, rate, bits=16)
    noise = rng.integers(-32768, 32768, size=(S, 2)).astype(np.float32)
    blobs["noise"] = encode_flac(noise / 2.0 ** 15, rate, bits=16)

    for label, blob in blobs.items():
        print(f"--- {label}: {len(blob)} bytes/file "
              f"({len(blob) / (S * 4):.2f}x raw), {n_files} files, "
              f"{seconds:.0f}s each", flush=True)
        for it in range(4):
            t0 = time.perf_counter()
            analyses = [FF.analyze(blob) for _ in range(n_files)]
            t1 = time.perf_counter()
            args, statics = FD.pack_group(analyses)
            t2 = time.perf_counter()
            pcm, ovf = flac_decode_batch(*args, **statics)
            # force execution through a fetch (block_until_ready does not
            # execute over this tunnel)
            anchor = float(pcm[0, -1, 0]) + float(pcm[-1, 0, 0])
            t3 = time.perf_counter()
            np.asarray(pcm)
            t4 = time.perf_counter()
            audio = n_files * seconds
            print(f"  it{it}: walk {t1 - t0:6.2f}s  pack {t2 - t1:5.2f}s  "
                  f"device+anchor {t3 - t2:6.2f}s  fetch {t4 - t3:5.2f}s  "
                  f"e2e(no fetch) {audio / (t3 - t0):7.1f}x  "
                  f"e2e {audio / (t4 - t0):7.1f}x", flush=True)
        del anchor


if __name__ == "__main__":
    main()
