"""Native-surface stress driver (NO jax import) — run under ASan.

The full pytest suite can't run under AddressSanitizer (XLA's CPU JIT
aborts under the preloaded interceptors), so this script drives every
C++ surface the suite exercises — mp3fe probe/analyze/lanes/session over
clean + mutated LAME/twolame streams, and the blastrt ring/sink — with
only numpy + ctypes, so ASan can check all native writes:

    make -C audio_decoder_tpu/native clean
    make -C audio_decoder_tpu/native CXXFLAGS="-O1 -g -fPIC -std=c++17 \
        -Wall -fsanitize=address"
    LD_PRELOAD=$(gcc -print-file-name=libasan.so) \
        ASAN_OPTIONS=detect_leaks=0 python tools/native_stress.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import codec_refs as CR  # noqa: E402
from audio_decoder_tpu.codecs.mpeg import native as NA  # noqa: E402


def stress_mp3fe(rng) -> None:
    assert NA.available(), "native mp3fe not built"
    from audio_decoder_tpu.codecs.mpeg import frontend as FE

    blobs = []
    for i, (rate, br, mode, n) in enumerate([
        (44100, 128, 1, 44100), (44100, 320, 0, 22050),
        (22050, 64, 1, 22050), (8000, 24, 3, 16000),
        (48000, 192, 1, 12000), (11025, 32, 1, 11025),
    ]):
        ch = 1 if mode == 3 else 2
        s = 0.3 * rng.standard_normal(n)
        pcm = np.clip(
            (np.stack([s, np.roll(s, 11) * 0.8], 1)[:, :ch]) * 30000,
            -32768, 32767).astype(np.int16)
        blobs.append(CR.lame_encode(pcm, rate, br, mode=mode))
    if CR.have_twolame():
        s = 0.3 * rng.standard_normal(11520)
        pcm = np.clip(np.stack([s, s * 0.7], 1) * 30000,
                      -32768, 32767).astype(np.int16)
        blobs.append(CR.twolame_encode(pcm, 44100, 192))

    # classic entry points (probe + analyze_batch + lanes_batch)
    for b in blobs:
        NA.probe(b)
    l3 = [b for b in blobs if FE.probe_layer(b) == 3]
    for ch in (1, 2):
        sub = [b for b in l3 if NA.probe(b)["channels"] == ch]
        if not sub:
            continue
        g_cap = 1
        while g_cap < max(NA.probe(b)["n_granules"] for b in sub):
            g_cap *= 2
        m_cap = 1024
        while m_cap < max(NA.probe(b)["main_bytes"] for b in sub):
            m_cap *= 2
        NA.analyze_batch(sub, g_cap, ch, True)
        NA.lanes_batch(sub, g_cap, m_cap, ch)
        # deliberately UNDERSIZED g_cap exercises the overflow guards
        NA.lanes_batch(sub, max(g_cap // 2, 1), m_cap, ch)

    # session API (single walk, layer routing, lanes from stored tables)
    sess = NA.Mp3Session(blobs)
    idxs = [i for i, p in enumerate(sess.infos) if p["err"] == 0
            and sess.layers[i] == 3]
    if idxs:
        by_ch: dict[int, list[int]] = {}
        for i in idxs:
            by_ch.setdefault(sess.infos[i]["channels"], []).append(i)
        for ch, ii in by_ch.items():
            g_cap = 1
            while g_cap < max(sess.infos[i]["n_granules"] for i in ii):
                g_cap *= 2
            m_cap = 1024
            while m_cap < max(sess.infos[i]["main_bytes"] for i in ii):
                m_cap *= 2
            sess.lanes_batch(ii, g_cap, m_cap, ch)
    sess.close()

    # corruption sweep: random byte flips + truncations must never write
    # out of bounds (the suite's fuzz tests do this through decode paths)
    base = l3[0]
    for trial in range(200):
        mut = bytearray(base)
        for _ in range(int(rng.integers(1, 8))):
            mut[int(rng.integers(0, len(mut)))] ^= int(rng.integers(1, 256))
        cut = int(rng.integers(0, len(mut)))
        data = bytes(mut[:cut]) if trial % 3 == 0 else bytes(mut)
        info = NA.probe(data)
        if info["err"] != 0:
            continue
        g_cap = 1
        while g_cap < max(info["n_granules"], 1):
            g_cap *= 2
        m_cap = 1024
        while m_cap < max(info["main_bytes"], 1):
            m_cap *= 2
        NA.lanes_batch([data], g_cap, m_cap, info["channels"])
    print("mp3fe stress: ok")


def stress_blastrt() -> None:
    from audio_decoder_tpu.runtime import native as RT

    ring = RT.CmdRing(64)
    for k in range(500):
        ring.try_push(f"cmd {k} {'x' * (k % 250)}")
        if k % 3:
            ring.try_pop()
    while ring.try_pop() is not None:
        pass
    blk = (np.random.default_rng(0).integers(
        -32768, 32768, size=(128, 2))).astype(np.int16)
    for mode in ("auto", "writei", "mmap"):
        sink = RT.Sink("default", 44100, 2, capture=True, realtime=True,
                       mode=mode)
        for _ in range(100):
            sink.write(blk)
        sink.close()
    print("blastrt stress: ok")


def main() -> None:
    rng = np.random.default_rng(0xA5A)
    stress_mp3fe(rng)
    try:
        stress_blastrt()
    except Exception as e:  # binding names may drift; report, don't mask
        print(f"blastrt stress skipped: {e!r}")
    print("native stress: ALL OK")


if __name__ == "__main__":
    main()
