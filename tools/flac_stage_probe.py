import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Per-stage on-device timing of the fused FLAC program.

Uses flac_decode_batch's ``stage`` static arg (scan → vals → predict →
full), so the probe always measures the REAL implementation — the old
copy of the program body in this file went stale the moment the
signature changed.
"""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audio_decoder_tpu.codecs.flac import frontend, decoder
from audio_decoder_tpu.codecs.flac.device import flac_decode_batch

rate, seconds, n = 44100, 30, 16
from _probe_data import music_flac_30s
blob = music_flac_30s()
analyses = [frontend.analyze(blob) for _ in range(n)]
args, statics = decoder.pack_group(analyses)
for a in args:
    a.block_until_ready()
# force residency with a real fetch (block_until_ready does not force
# remote execution on the axon tunnel)
_ = int(np.asarray(args[0][:1])[0])

def _force(r):
    # tiny fetch: full's pcm is ~200 MB — fetching it all would time the
    # wire, not the program (observed 11.2 s of pure d2h on the tunnel)
    return float(np.asarray(r[0][..., -1]).reshape(-1)[-1])


for stage in ("scan", "vals", "predict", "full"):
    r = flac_decode_batch(*args, **statics, stage=stage)
    _force(r)  # warm/compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = flac_decode_batch(*args, **statics, stage=stage)
        _force(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{stage:8s}: {best*1000:.0f} ms", flush=True)
