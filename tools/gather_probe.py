import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Row-GATHER variants at the FLAC value-assembly shape.

The inverse of tools/scatter_probe.py: instead of scatter-adding
[Lr, W] lane windows into the [~50M] destination grid, gather the
destination grid FROM the flat source — 8-wide aligned blocks, each
block's source start derived from a per-block affine map (cumsum of
per-lane deltas).  This probe times the candidate primitives:

  a) 8-wide row gather at NB=N/8 block indices (lax.gather, CLIP)
  b) element gather at N indices (bounding the naive map)
  c) 32-wide row gather at N/32 indices
  e) cumsum over NB i32 (the map-construction cost)
(A take-along variant was considered and dropped — it lowers to the
same gather as (a), so only a/b/c/e run below.)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

Ls, nmax = 12288, 4096
N = Ls * (nmax + 1)          # ~50.3M destination grid
NB = N // 8
NSRC = 196608 * 512          # ~100M flat source
rng = np.random.default_rng(0)
src = jnp.asarray(rng.integers(-1000, 1000, size=NSRC + 64).astype(np.int32))
bidx = jnp.asarray((rng.integers(0, NSRC - 64, size=NB) & ~7).astype(np.int32))
eidx = jnp.asarray(rng.integers(0, NSRC, size=N).astype(np.int32))
bidx32 = jnp.asarray((rng.integers(0, NSRC - 64, size=N // 32) & ~31).astype(np.int32))
dg = jnp.asarray(rng.integers(-100, 100, size=NB).astype(np.int32))


def run(label, fn, *a):
    f = jax.jit(fn)
    r = f(*a)
    float(np.asarray(r.reshape(-1)[-1]))  # warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*a)
        float(np.asarray(r.reshape(-1)[-1]))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s}: {best*1000:.0f} ms", flush=True)


def row8(s, i):
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
    g = lax.gather(s, i[:, None], dn, slice_sizes=(8,),
                   mode=lax.GatherScatterMode.CLIP)
    return g.reshape(-1)[:N].sum(dtype=jnp.int32)[None]


def elem(s, i):
    return s[i].sum(dtype=jnp.int32)[None]


def row32(s, i):
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
    g = lax.gather(s, i[:, None], dn, slice_sizes=(32,),
                   mode=lax.GatherScatterMode.CLIP)
    return g.reshape(-1)[:N].sum(dtype=jnp.int32)[None]


def cum(d):
    return jnp.cumsum(d)[-8:]


run("a row8 gather NB", row8, src, bidx)
run("b element gather N", elem, src, eidx)
run("c row32 gather N/32", row32, src, bidx32)
run("e cumsum NB", cum, dg)
