import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""FLAC end-to-end probe: serialized split + pipelined decode_group.

Part 1 times each stage serialized (walk / pack / h2d / device+fetch)
— the attribution table for docs/PERFORMANCE.md.  Part 2 runs the REAL
``decode_group`` path, which ships each chunk's bytes before the walk
and overlaps chunk k's device program with chunk k+1's transfer — the
number the bench's flac_e2e_x reflects.
"""
import time, numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from audio_decoder_tpu.codecs.flac import frontend, decoder
from audio_decoder_tpu.codecs.flac.device import flac_decode_wire

rate, seconds, n = 44100, 30, 16
from _probe_data import music_flac_30s
blob = music_flac_30s()
print(f"blob {len(blob)/1e6:.2f} MB (cached cpu encode)", flush=True)

audio_secs = n * seconds

print("--- serialized split (one fused group, wire entry)", flush=True)
for it in range(3):
    t0 = time.perf_counter()
    analyses = [frontend.analyze(blob) for _ in range(n)]
    t1 = time.perf_counter()
    args, statics = decoder.pack_wire(analyses)
    t2 = time.perf_counter()
    for a in args: a.block_until_ready()
    int(np.asarray(args[1][:1])[0])  # fetch-forced h2d sync
    t3 = time.perf_counter()
    pcm, ovf = flac_decode_wire(*args, **statics)
    anchor = float(np.asarray(pcm[:, -1]).sum())
    t4 = time.perf_counter()
    print(f"iter{it}: walk {t1-t0:.3f}s pack {t2-t1:.3f}s h2d-sync {t3-t2:.3f}s "
          f"device+fetch {t4-t3:.3f}s total {t4-t0:.3f}s -> {audio_secs/(t4-t0):.0f}x",
          flush=True)

a0 = analyses[0]
print("n_frames", a0.n_frames, "rl lanes", a0.rl_sub.size, "fw lanes", a0.fw_sub.size,
      "dv", a0.dv_sub.size, "statics", statics)
tot = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in args)
print(f"wire bytes {tot/1e6:.2f} MB for {len(blob)*n/1e6:.1f} MB of flac", flush=True)

print("--- pipelined decode_group (early h2d + chunk overlap)", flush=True)


class _Asset:
    def __init__(self, name, data):
        self.name, self.data = name, data


assets = [_Asset(f"f{i}", blob) for i in range(n)]
for it in range(3):
    t0 = time.perf_counter()
    secs = 0.0
    for _idxs, b in decoder.decode_group(assets):
        anchor = b.data[:, -1].sum() * 0.0
        secs += float(b.audio_seconds() + anchor)
    dt = time.perf_counter() - t0
    print(f"iter{it}: {dt:.3f}s for {secs:.0f} audio-sec -> {secs/dt:.0f}x",
          flush=True)
