import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Row-window scatter-add variants at the FLAC value-assembly shape.

The fused FLAC program's value assembly (device._window_add over
[Lr≈200k, W=512] rice updates into a ~50M i32 buffer) measures ~540 ms
on-chip — NOT bandwidth (1.2 GB of traffic would be ~2 ms), so the
lowering is paying something else (likely a sort for the non-unique,
unsorted scatter).  This probe times the candidates:

  a) scatter-add, unsorted (today's _window_add)
  b) scatter-add, indices_are_sorted=True (padding lanes re-pointed at
     the tail slack so starts really are non-decreasing)
  c) scatter-add sorted AND unique_indices=True (a LIE for overlapping
     windows in general — included only to bound the win; zeros make it
     value-correct here)
  d) the old element scatter .at[].set with unique indices (r3 baseline)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

Lr, W = 196608, 512
Ls, nmax = 12288, 4096
N = Ls * (nmax + 1)
rng = np.random.default_rng(0)
# representative: consecutive windows tiling subs, counts <= W
counts = rng.integers(64, W, size=Lr).astype(np.int32)
starts = np.zeros(Lr, np.int32)
at = 0
for i in range(Lr):
    starts[i] = at % (N - W)
    at += counts[i]
starts.sort()
upd = rng.integers(-1000, 1000, size=(Lr, W)).astype(np.int32)
ri = np.arange(W, dtype=np.int32)[None, :]
upd = np.where(ri < counts[:, None], upd, 0)

starts_d = jnp.asarray(starts)
upd_d = jnp.asarray(upd)

DN = lax.ScatterDimensionNumbers(
    update_window_dims=(1,), inserted_window_dims=(),
    scatter_dims_to_operand_dims=(0,))


def run(label, fn):
    f = jax.jit(fn)
    r = f(starts_d, upd_d)
    float(np.asarray(r[-8:]).sum())  # warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(starts_d, upd_d)
        float(np.asarray(r[-8:]).sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s}: {best*1000:.0f} ms", flush=True)


def a_unsorted(st, u):
    x = jnp.zeros((N + W,), jnp.int32)
    return lax.scatter_add(x, st[:, None], u, DN,
                           indices_are_sorted=False, unique_indices=False,
                           mode=lax.GatherScatterMode.CLIP)


def b_sorted(st, u):
    x = jnp.zeros((N + W,), jnp.int32)
    return lax.scatter_add(x, st[:, None], u, DN,
                           indices_are_sorted=True, unique_indices=False,
                           mode=lax.GatherScatterMode.CLIP)


def c_sorted_unique(st, u):
    x = jnp.zeros((N + W,), jnp.int32)
    return lax.scatter_add(x, st[:, None], u, DN,
                           indices_are_sorted=True, unique_indices=True,
                           mode=lax.GatherScatterMode.CLIP)


def d_element_set(st, u):
    x = jnp.zeros((N + W,), jnp.int32)
    idx = st[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    live = jnp.arange(W, dtype=jnp.int32)[None, :] < W  # all (bound case)
    idx = jnp.where(u != 0, idx, np.int32(2**31 - 256))
    return x.at[idx.reshape(-1)].set(u.reshape(-1), mode="drop",
                                     unique_indices=True)


for lbl, fn in (("a scatter-add unsorted", a_unsorted),
                ("b scatter-add sorted", b_sorted),
                ("c scatter-add sorted+unique", c_sorted_unique),
                ("d element set unique", d_element_set)):
    run(lbl, fn)
