import time, numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from audio_decoder_tpu.codecs.flac import frontend, decoder
from audio_decoder_tpu.codecs.flac.encode import encode_flac
from audio_decoder_tpu.codecs.flac.device import flac_decode_batch

rate, seconds, n = 44100, 30, 16
frames = rate * seconds
rng = np.random.default_rng(7)
t = np.arange(frames) / rate
m = np.zeros(frames)
for f0, a in ((110.0, 0.35), (220.5, 0.2), (331.1, 0.12)):
    m += a * np.sin(2 * np.pi * f0 * t) * np.exp(-0.2 * t)
m += 0.002 * rng.standard_normal(frames)
mus = np.clip(np.stack([m, 0.8 * m], 1) * 20000, -32768, 32767).astype(np.float32) / 2.0 ** 15

t0 = time.perf_counter(); blob = encode_flac(mus, rate, bits=16)
print(f"encode: {time.perf_counter()-t0:.3f}s, blob {len(blob)/1e6:.2f} MB")

audio_secs = n * seconds

for it in range(3):
    t0 = time.perf_counter()
    analyses = [frontend.analyze(blob) for _ in range(n)]
    t1 = time.perf_counter()
    args, statics = decoder.pack_group(analyses)
    t2 = time.perf_counter()
    # force h2d of all args
    for a in args: a.block_until_ready()
    t3 = time.perf_counter()
    pcm, ovf = flac_decode_batch(*args, **statics)
    anchor = float(np.asarray(pcm[:, -1]).sum())
    t4 = time.perf_counter()
    print(f"iter{it}: walk {t1-t0:.3f}s pack {t2-t1:.3f}s h2d-sync {t3-t2:.3f}s "
          f"device+fetch {t4-t3:.3f}s total {t4-t0:.3f}s -> {audio_secs/(t4-t0):.0f}x")

a0 = analyses[0]
print("n_frames", a0.n_frames, "rl lanes", a0.rl_sub.size, "fw lanes", a0.fw_sub.size,
      "dv", a0.dv_sub.size, "statics", statics)
tot = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in args)
print(f"wire bytes {tot/1e6:.2f} MB for {len(blob)*n/1e6:.1f} MB of flac")
