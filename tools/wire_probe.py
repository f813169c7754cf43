"""Tunnel/wire attribution probe — the bench preamble (VERDICT r3 #3).

Measures the three numbers that attribute a bench-capture swing to the
tunnel host vs a code regression:

  * incompressible h2d MB/s   (random bytes — the FLAC/MP3/WAV payload case)
  * zeros h2d MB/s            (the tunnel transport compresses traffic)
  * dispatch floor ms         (round-trip latency of a trivial program)

Run standalone for a table, or import ``probe(jnp)`` for the dict the
bench embeds in its JSON line.
"""

from __future__ import annotations

import time

import numpy as np


def probe(jnp, size_mb: int = 16, reps: int = 3) -> dict:
    """Return {h2d_mbps, h2d_zeros_mbps, dispatch_ms} measured now.

    Small (16 MB) single transfers: big enough to amortize latency,
    small enough to dodge the >64 MB tunnel cliff and keep the preamble
    cheap.  Fetch-forced throughout (on the axon tunnel only a
    device->host fetch synchronizes)."""
    n = size_mb * (1 << 20)
    rng = np.random.default_rng(11)

    out: dict = {}
    for key, buf in (("h2d_mbps", rng.integers(0, 256, n, np.uint8)),
                     ("h2d_zeros_mbps", np.zeros((n,), np.uint8))):
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            d = jnp.asarray(buf)
            _ = int(d[-1])  # fetch-forced sync
            dt = time.perf_counter() - t0
            best = max(best, size_mb / dt)
            del d
        out[key] = round(best, 1)

    # dispatch floor: tiny program round-trip (fetch included — that is
    # what every e2e figure in this repo pays per result)
    x = jnp.zeros((8,), np.float32)
    _ = float((x + 1.0)[0])  # warm the +1 program
    best = float("inf")
    for _ in range(max(reps, 5)):
        t0 = time.perf_counter()
        _ = float((x + 1.0)[0])
        best = min(best, time.perf_counter() - t0)
    out["dispatch_ms"] = round(best * 1e3, 2)
    return out


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    r = probe(jnp)
    print(f"probe ({time.perf_counter()-t0:.1f}s): {r}")
