import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Pallas window_add vs XLA scatter-add at the FLAC value-assembly shape.

Same workload as tools/scatter_probe.py variant (a): [Lr, W] sorted
tiling windows into a ~50M i32 grid, plus the PCM-assembly f32 shape.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audio_decoder_tpu.ops.window_add import window_add

DN = lax.ScatterDimensionNumbers(
    update_window_dims=(1,), inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0,))


def scatter(starts, upd, n_out):
    x = jnp.zeros((n_out,), upd.dtype)
    return lax.scatter_add(x, starts[:, None], upd, DN,
                           indices_are_sorted=False, unique_indices=False,
                           mode=lax.GatherScatterMode.CLIP)


def bench(label, fn, *a, **kw):
    f = jax.jit(fn, static_argnames=tuple(kw))
    r = f(*a, **kw)
    anchor0 = float(np.asarray(r[-8:]).sum())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*a, **kw)
        float(np.asarray(r[-8:]).sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{label:24s}: {best*1000:7.1f} ms", flush=True)
    return anchor0


def case(L, W, n_live, dtype, seed):
    rng = np.random.default_rng(seed)
    counts = rng.integers(W // 4, W + 1, size=n_live)
    starts = np.zeros(L, np.int32)
    at = 0
    for i in range(n_live):
        starts[i] = at
        at += int(counts[i])
    n_out = at + 2 * W + 512
    if dtype == np.int32:
        upd = rng.integers(-1000, 1000, size=(L, W)).astype(dtype)
    else:
        upd = rng.standard_normal((L, W)).astype(dtype)
    live = np.arange(W)[None, :] < counts[:, None]
    upd[:n_live] = np.where(live, upd[:n_live], 0)
    upd[n_live:] = 0
    return jnp.asarray(starts), jnp.asarray(upd), int(n_out)


# the measured FLAC 16x30s shape: Lr=196608 bucketed (165k live), W=256
starts, upd, n_out = case(196608, 256, 165376, np.int32, 0)
print(f"value assembly: [{upd.shape[0]}, {upd.shape[1]}] -> {n_out/1e6:.1f}M",
      flush=True)
a1 = bench("xla scatter-add", scatter, starts, upd, n_out=n_out)
a2 = bench("pallas window_add", window_add, starts, upd, n_out=n_out)
s = float(np.asarray(scatter(starts, upd, n_out)).astype(np.int64).sum())
p = float(np.asarray(window_add(starts, upd, n_out)).astype(np.int64).sum())
print(f"checksum scatter {s} pallas {p} match={s == p}", flush=True)

# PCM assembly shape: F=6144 frames, W = nmax*ch = 8192, f32
starts, upd, n_out = case(6144, 8192, 5168, np.float32, 1)
print(f"pcm assembly: [{upd.shape[0]}, {upd.shape[1]}] -> {n_out/1e6:.1f}M",
      flush=True)
bench("xla scatter-add", scatter, starts, upd, n_out=n_out)
bench("pallas window_add", window_add, starts, upd, n_out=n_out)
s = float(np.asarray(scatter(starts, upd, n_out)).astype(np.float64).sum())
p = float(np.asarray(window_add(starts, upd, n_out)).astype(np.float64).sum())
print(f"checksum scatter {s} pallas {p} match={s == p}", flush=True)
