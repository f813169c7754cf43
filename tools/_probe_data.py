"""Shared probe inputs: a 30 s stereo music-like FLAC stream.

Generated ONCE in a CPU subprocess and cached on disk — encoding on the
attached chip would serialize the probe behind tunnel-remote compiles
and multi-MB d2h fetches of the encoder's analysis tensors, which in
degraded tunnel windows takes tens of minutes (observed r4).
"""

from __future__ import annotations

import os
import subprocess
import sys

CACHE = "/tmp/adt_probe30s.flac"

_GEN = r"""
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, sys
sys.path.insert(0, %(root)r)
from audio_decoder_tpu.codecs.flac.encode import encode_flac
rate, seconds = 44100, 30
frames = rate * seconds
rng = np.random.default_rng(7)
t = np.arange(frames) / rate
m = np.zeros(frames)
for f0, a in ((110.0, 0.35), (220.5, 0.2), (331.1, 0.12)):
    m += a * np.sin(2 * np.pi * f0 * t) * np.exp(-0.2 * t)
m += 0.002 * rng.standard_normal(frames)
mus = np.clip(np.stack([m, 0.8 * m], 1) * 20000,
              -32768, 32767).astype(np.float32) / 2.0 ** 15
open(%(cache)r, "wb").write(encode_flac(mus, rate, bits=16))
"""


def music_flac_30s() -> bytes:
    """The probe stream (same content as rounds 2-3's probes)."""
    if not os.path.exists(CACHE):
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(
            [sys.executable, "-c", _GEN % dict(root=root, cache=CACHE)],
            check=True, env=dict(os.environ, JAX_PLATFORMS="cpu"))
    with open(CACHE, "rb") as f:
        return f.read()
