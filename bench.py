#!/usr/bin/env python
"""Benchmark: decoded audio-seconds per second per chip, mixed WAV + MP3.

The BASELINE.json north-star metric: throughput of the batched decode
pipeline on the attached chip, decoding a mixed batch of WAV files (fused
header-parse + PCM-unpack jit) and MP3 files (host C++ frame/side-info
walk + full on-device entropy decode + DSP via mp3_decode_fused).  The
reference decodes ~1x real-time per process (it decodes at load time and
renders in real time; BASELINE.md), so ``vs_baseline`` is the raw
real-time multiple.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (plus
informational extras as time permits: iteration count, wire-attribution
probes (dispatch floor ms, rand/zeros h2d MB/s — the host fingerprint
that separates code regressions from tunnel variance across rounds),
WAV/FLAC end-to-end figures, p50 per-file decode latency (the second
half of BASELINE.json's metric), and a three-family
``decode_throughput_mixed3`` combined figure).

Robustness: the TPU here sits behind a network tunnel that intermittently
stalls for minutes (round-1 captures ranged 842x-1575x on identical
code; the 33.6 MB WAV setup transfer was observed to take 450+ s in
stall windows).  This harness is built to always emit a result line:
  * the WAV byte buffers are synthesized ON DEVICE (device RNG ->
    int16 bytes + RIFF header constant), byte-identical in layout to
    the host-packed buffers, so setup moves ~no bytes over the wire —
    the measured decode consumes device-resident buffers either way,
    exactly as it did when they were uploaded once at setup;
  * two warmup runs absorb compile + first-touch costs;
  * measurement is time-budgeted best-of-N (not a fixed 5), so a slow
    window is ridden out instead of averaged in (the per-iteration MP3
    front-end wire transfer remains genuinely measured work);
  * a watchdog thread prints the best-so-far measurement and exits
    before the hard deadline if the main thread is wedged in a blocking
    device call.
"""

from __future__ import annotations

import json
import os
import struct
import sys
import threading
import time

# Runnable from any CWD: the package lives next to this file.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The working interpreter lives in /opt/venv; re-exec if invoked with a
# bare system python that lacks the scientific stack.
try:
    import numpy as np
except ImportError:  # pragma: no cover
    venv_py = "/opt/venv/bin/python"
    if os.path.exists(venv_py) and os.path.realpath(sys.executable) != venv_py:
        os.execv(venv_py, [venv_py] + sys.argv)
    raise

T0 = time.perf_counter()
#: hard wall-clock bound on the whole run; the watchdog emits whatever
#: has been measured by then.  Overridable for local experiments.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "540"))
#: measurement-loop budget once warm (seconds)
MEASURE_BUDGET_S = float(os.environ.get("BENCH_MEASURE_S", "45"))

_RESULT_LOCK = threading.Lock()
_RESULT: dict = {}
_emitted = False


def _emit_and_exit(code: int = 0) -> None:
    """Print the best-so-far JSON line exactly once and hard-exit.

    os._exit is deliberate: the main thread may be wedged inside a
    blocking tunnel call that would never let a normal exit run.  The
    emitted test-and-set happens under the lock: watchdog and main
    thread can race here, and the output contract is ONE line."""
    global _emitted
    with _RESULT_LOCK:
        first = not _emitted
        _emitted = True
        if first:
            if _RESULT:
                print(json.dumps(_RESULT), flush=True)
            else:
                # nothing measured at all: say so honestly on stderr;
                # no fabricated numbers on stdout
                print("bench: no measurement completed before deadline",
                      file=sys.stderr, flush=True)
                code = max(code, 1)
    os._exit(code)


def _note(msg: str) -> None:
    print(f"[bench {time.perf_counter()-T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _record(value: float, **extra) -> None:
    with _RESULT_LOCK:
        _RESULT.update({
            "metric": "decode_throughput_mixed",
            "value": round(value, 1),
            "unit": "audio_sec/sec/chip",
            "vs_baseline": round(value, 1),
        })
        _RESULT.update(extra)


def _remaining() -> float:
    return DEADLINE_S - (time.perf_counter() - T0)


def _wav_blob(rng, seconds: float, rate: int = 44100, channels: int = 2,
              music: bool = False) -> bytes:
    frames = int(seconds * rate)
    if music:
        # compressible "real content": a sparse mix of decaying partials
        # (quantized int16 music compresses on wires/disks; noise doesn't)
        t = np.arange(frames) / rate
        s = np.zeros(frames)
        for f0, a in ((110.0, 0.4), (220.5, 0.25), (331.1, 0.15),
                      (442.3, 0.08)):
            s += a * np.sin(2 * np.pi * f0 * t) * np.exp(-0.2 * t)
        x = np.stack([s, 0.8 * s], 1)
        pcm = np.clip(x * 20000, -32768, 32767).astype("<i2")
    else:
        pcm = rng.integers(-32768, 32768,
                           size=(frames, channels)).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mp3_blob(rng, seconds: float, rate: int = 44100) -> bytes | None:
    """LAME-encoded stereo noise (None if libmp3lame is unavailable)."""
    import ctypes as C

    try:
        L = C.CDLL("libmp3lame.so.0")
    except OSError:
        return None
    L.lame_init.restype = C.c_void_p
    gfp = C.c_void_p(L.lame_init())
    n = int(seconds * rate)
    s = 0.3 * rng.standard_normal(n)
    x = np.stack([s, np.roll(s, 17) * 0.8], 1)
    pcm = np.clip(x * 30000, -32768, 32767).astype(np.int16)
    L.lame_set_num_channels(gfp, 2)
    L.lame_set_in_samplerate(gfp, rate)
    L.lame_set_out_samplerate(gfp, rate)
    L.lame_set_brate(gfp, 128)
    L.lame_set_mode(gfp, 1)
    L.lame_set_bWriteVbrTag(gfp, 0)
    if L.lame_init_params(gfp) < 0:
        return None
    out = np.zeros(n * 5 // 4 + 7200 * 4, np.uint8)
    w = L.lame_encode_buffer_interleaved(
        gfp, pcm.ctypes.data_as(C.POINTER(C.c_short)), n,
        out.ctypes.data_as(C.POINTER(C.c_ubyte)), len(out))
    w2 = L.lame_encode_flush(
        gfp, out[w:].ctypes.data_as(C.POINTER(C.c_ubyte)), len(out) - w)
    L.lame_close(gfp)
    return bytes(out[: w + w2])


def _chunked_h2d(jnp, bufs_np):
    """Move [B, L] bytes host->device as per-file transfers + device
    stack.  One big transfer was observed to wedge for minutes in tunnel
    stall windows while file-sized ones squeeze through; on a healthy
    link the difference is noise."""
    rows = [jnp.asarray(bufs_np[i]) for i in range(bufs_np.shape[0])]
    out = jnp.stack(rows)
    # force with a 1-element fetch: on this tunnel block_until_ready
    # returns without executing; only device->host fetches synchronize
    int(out[0, 0])
    return out


def _wire_probe(jax, jnp) -> dict:
    """10-second attribution preamble: host fingerprint for the capture.

    Three numbers that separate "the code regressed" from "the tunnel was
    slow" when captures drift across rounds (r02 1705x vs r03 1499x was
    unattributable without these):
      * ``probe_dispatch_ms``  — round-trip floor of one trivial jitted
        dispatch + 1-element fetch (the per-dispatch tunnel latency);
      * ``probe_h2d_rand_mbps``  — 8 MiB incompressible host->device;
      * ``probe_h2d_zeros_mbps`` — 8 MiB of zeros (tunnel compression
        headroom; = rand on a local PCIe link).
    Transfers are forced by a 1-element fetch — on this tunnel
    block_until_ready returns without executing."""
    probes: dict = {}
    one = jnp.ones((8,), jnp.float32)

    @jax.jit
    def bump(x):
        return x + 1.0

    float(bump(one)[0])  # compile/warm
    best = 1e9
    for _ in range(5):
        t = time.perf_counter()
        float(bump(one)[0])
        best = min(best, time.perf_counter() - t)
    probes["probe_dispatch_ms"] = round(best * 1e3, 2)

    nbytes = 8 << 20
    rnd = np.random.default_rng(3).integers(
        0, 256, size=(nbytes,), dtype=np.uint8)
    zer = np.zeros((nbytes,), np.uint8)
    for label, buf in (("rand", rnd), ("zeros", zer)):
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            d = jnp.asarray(buf)
            int(d[-1])
            best = min(best, time.perf_counter() - t)
            del d
        probes[f"probe_h2d_{label}_mbps"] = round(nbytes / 1e6 / best, 1)
    return probes


def _device_wav_batch(jax, jnp, header: bytes, n: int, frames: int,
                      channels: int, width: int):
    """Synthesize the padded [n, width] WAV byte tensor on device:
    random int16 PCM from the device RNG, packed to little-endian byte
    pairs, behind the 44-byte RIFF header — the same buffer layout
    ``pack_bytes`` produces from host blobs, with zero wire traffic."""
    hdr = jnp.asarray(np.frombuffer(header, np.uint8))
    body = frames * channels * 2

    @jax.jit
    def gen(key):
        pcm = jax.random.randint(
            key, (n, frames * channels), -32768, 32768, jnp.int32)
        lo = (pcm & 0xFF).astype(jnp.uint8)
        hi = ((pcm >> 8) & 0xFF).astype(jnp.uint8)
        pb = jnp.stack([lo, hi], -1).reshape(n, body)
        h = jnp.broadcast_to(hdr, (n, hdr.shape[0]))
        pad = jnp.zeros((n, width - hdr.shape[0] - body), jnp.uint8)
        return jnp.concatenate([h, pb, pad], axis=1)

    bufs = gen(jax.random.PRNGKey(7))
    int(bufs[0, 0])  # force generation (fetch-forced on this tunnel)
    return bufs


def main() -> None:
    watchdog = threading.Timer(max(DEADLINE_S - 2.0, 5.0), _emit_and_exit)
    watchdog.daemon = True
    watchdog.start()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # the axon sitecustomize overrides the JAX_PLATFORMS env var; only a
    # pre-init config.update can force CPU (structural smoke runs)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    from audio_decoder_tpu.codecs.mpeg import decoder as mpeg_decoder
    from audio_decoder_tpu.io.assets import Asset, pack_bytes
    from audio_decoder_tpu.parallel.decode import decode_pcm_step

    rng = np.random.default_rng(7)
    n_wav, n_mp3 = 16, 16
    seconds = 10.0
    rate = 44100

    frames = int(seconds * rate)
    # one host blob supplies the 44-byte header template + the padded
    # width contract; the batch itself is synthesized on device
    template = _wav_blob(rng, seconds, rate)
    t_bufs, t_lens = pack_bytes([template])
    _note(f"setup: synthesizing {n_wav} wav buffers on device "
          f"([{n_wav}, {t_bufs.shape[1]}] u8)")
    wav_bufs = _device_wav_batch(
        jax, jnp, template[:44], n_wav, frames, 2, t_bufs.shape[1])
    lens_np = np.full((n_wav,), t_lens[0], np.int32)
    wav_lens = jnp.asarray(lens_np)
    _note("wav buffers on device")
    max_frames = 1
    while max_frames < int(seconds * rate):
        max_frames *= 2

    probes: dict = {}
    try:
        probes = _wire_probe(jax, jnp)
        _note(f"wire probe: {probes}")
    except Exception as e:  # the preamble must never cost the line
        _note(f"wire probe skipped: {e!r}")

    mp3 = _mp3_blob(rng, seconds, rate)
    mp3_assets = (
        [Asset(path=f"m{i}", name=f"m{i}", ext="mp3", data=mp3)
         for i in range(n_mp3)]
        if mp3 is not None else []
    )

    def run_once() -> float:
        """One full mixed decode; returns decoded audio-seconds.

        WAV device work is dispatched first (async) so it overlaps the MP3
        host frame/side-info walk — only the final scalar fetches sync."""
        pcm, meta = decode_pcm_step(
            wav_bufs, wav_lens, bits=16, channels=2,
            max_frames=max_frames, family="wav")
        wav_frames = jnp.sum(meta["n_frames"])  # stays async on device
        mp3_secs = []
        if mp3_assets:
            for _idxs, batch in mpeg_decoder.decode_group(mp3_assets):
                # derive the scalar THROUGH pcm so fetching it forces the
                # whole decode execution (audio_seconds alone would not
                # depend on the pcm buffer)
                anchor = batch.data[:, -1].sum() * 0.0
                mp3_secs.append(batch.audio_seconds() + anchor)
        audio = float(wav_frames) / rate
        audio += sum(float(s) for s in mp3_secs)
        return audio

    # two warmups: first pays compile/cache-load, second pays any lazy
    # per-call first-touch costs so measurement starts truly steady-state
    t = time.perf_counter()
    run_once()
    _note(f"warmup 1: {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    audio = run_once()
    dt = time.perf_counter() - t
    _note(f"warmup 2: {dt:.2f}s")
    # warmup 2 already runs at full speed; seed the result with it so the
    # watchdog has a real number from here on (probes ride along: _RESULT
    # only ever accumulates, so one mention persists them into the line)
    _record(audio / dt, iters=0, **probes)

    # time-budgeted best-of-N: more iterations ride out slow tunnel
    # windows that a fixed best-of-5 averages in
    budget = min(MEASURE_BUDGET_S, max(_remaining() - 30.0, 5.0))
    t_loop = time.perf_counter()
    best = audio / dt
    iters = 0
    while (time.perf_counter() - t_loop < budget and iters < 200) or iters < 3:
        t = time.perf_counter()
        audio = run_once()
        dt = time.perf_counter() - t
        iters += 1
        if audio / dt > best:
            best = audio / dt
            _record(best, iters=iters)
    _record(best, iters=iters)
    _note(f"measured best {best:.0f}x over {iters} iters")

    # secondary, time-permitting: compressible-content WAV end-to-end
    # (h2d transfer + decode) vs the noise worst case — quantifies how
    # much of the WAV wall is tunnel wire for compressible real content
    extras: dict = {}
    if _remaining() > 90.0:
        try:
            music = [_wav_blob(rng, seconds, rate, music=True)
                     for _ in range(n_wav)]
            mbufs_np, mlens_np = pack_bytes(music)
            noise = [_wav_blob(rng, seconds, rate) for _ in range(n_wav)]
            nbufs_np, nlens_np = pack_bytes(noise)
            # warm the transfer-path program once (its first run pays the
            # compile/handle setup and would land on whichever label goes
            # first — r2 captures showed music < noise purely from order)
            pcm, meta = decode_pcm_step(
                _chunked_h2d(jnp, mbufs_np), jnp.asarray(mlens_np),
                bits=16, channels=2, max_frames=max_frames, family="wav")
            float(jnp.sum(meta["n_frames"]))
            for label, src, slens in (("music", mbufs_np, mlens_np),
                                      ("noise", nbufs_np, nlens_np)):
                t = time.perf_counter()
                bufs = _chunked_h2d(jnp, src)
                lens = jnp.asarray(slens)
                pcm, meta = decode_pcm_step(
                    bufs, lens, bits=16, channels=2,
                    max_frames=max_frames, family="wav")
                nf = float(jnp.sum(meta["n_frames"]))
                dt = time.perf_counter() - t
                extras[f"wav_e2e_{label}_x"] = round(nf / rate / dt, 1)
            _record(best, iters=iters, **extras)
            _note(f"wav e2e incl. transfer: {extras}")
        except Exception as e:  # the secondary must never cost the line
            _note(f"secondary skipped: {e!r}")

    # p50 per-file decode latency — the second half of BASELINE.json's
    # "metric" field (never reported before r4): one file end-to-end,
    # host bytes -> h2d -> fused decode -> PCM-forced fetch, p50 of the
    # run distribution (p50, not best: latency is what a caller waits)
    if _remaining() > 90.0:
        try:
            one = _wav_blob(rng, seconds, rate, music=True)
            obufs_np, olens_np = pack_bytes([one])
            # warm the B=1 shape (fresh compile on the chip, cached after)
            pcm, meta = decode_pcm_step(
                jnp.asarray(obufs_np), jnp.asarray(olens_np), bits=16,
                channels=2, max_frames=max_frames, family="wav")
            float(jnp.sum(meta["n_frames"]) + pcm[:, -1].sum() * 0)
            lat: list[float] = []
            while len(lat) < 21 and _remaining() > 45.0:
                t = time.perf_counter()
                pcm, meta = decode_pcm_step(
                    jnp.asarray(obufs_np), jnp.asarray(olens_np), bits=16,
                    channels=2, max_frames=max_frames, family="wav")
                # derive the scalar THROUGH pcm so the fetch forces decode
                float(jnp.sum(meta["n_frames"]) + pcm[:, -1].sum() * 0)
                lat.append(time.perf_counter() - t)
            if lat:
                extras["p50_file_latency_ms"] = round(
                    float(np.percentile(lat, 50)) * 1e3, 1)
                _record(best, iters=iters, **extras)
                _note(f"p50 per-file latency: "
                      f"{extras['p50_file_latency_ms']} ms over {len(lat)}")
        except Exception as e:
            _note(f"latency secondary skipped: {e!r}")

    # tertiary, time-permitting: FLAC end-to-end (our own encoder makes
    # the streams; decode = native walk + descriptor pack + h2d + fused
    # device program) — the lossless-codec counterpart of the MP3 number
    if _remaining() > 120.0:
        try:
            from audio_decoder_tpu.codecs.flac import decoder as flac_dec

            t = np.arange(frames) / rate
            m = np.zeros(frames)
            for f0, a in ((110.0, 0.35), (220.5, 0.2), (331.1, 0.12)):
                m += a * np.sin(2 * np.pi * f0 * t) * np.exp(-0.2 * t)
            m += 0.002 * rng.standard_normal(frames)
            mus = np.clip(np.stack([m, 0.8 * m], 1) * 20000,
                          -32768, 32767).astype(np.float32) / 2.0 ** 15
            from audio_decoder_tpu.codecs.flac.encode import encode_flac

            fblob = encode_flac(mus, rate, bits=16)
            fassets = [Asset(f"g{i}", f"g{i}", "flac", fblob)
                       for i in range(n_wav)]
            best_f = 0.0
            for _ in range(3):
                if _remaining() < 45.0:
                    break
                t0 = time.perf_counter()
                secs = 0.0
                for _idxs, fb in flac_dec.decode_group(fassets):
                    anchor = fb.data[:, -1].sum() * 0.0
                    secs += float(fb.audio_seconds() + anchor)
                best_f = max(best_f, secs / (time.perf_counter() - t0))
            if best_f:
                extras["flac_e2e_x"] = round(best_f, 1)
                _record(best, iters=iters, **extras)
                _note(f"flac e2e: {best_f:.0f}x")

            # three-family combined figure (round-2 task 8): WAV device
            # work dispatches first (async), then MP3 + FLAC host fronts
            # run while it executes — one wall clock over all three
            best_3 = 0.0
            for _ in range(3):
                if _remaining() < 45.0:
                    break
                t0 = time.perf_counter()
                pcm, meta = decode_pcm_step(
                    wav_bufs, wav_lens, bits=16, channels=2,
                    max_frames=max_frames, family="wav")
                wav_frames = jnp.sum(meta["n_frames"])
                secs = 0.0
                for _idxs, b in mpeg_decoder.decode_group(mp3_assets):
                    secs += float(b.audio_seconds() + b.data[:, -1].sum() * 0)
                for _idxs, fb in flac_dec.decode_group(fassets):
                    secs += float(fb.audio_seconds() + fb.data[:, -1].sum() * 0)
                secs += float(wav_frames) / rate
                best_3 = max(best_3, secs / (time.perf_counter() - t0))
            if best_3:
                extras["decode_throughput_mixed3"] = round(best_3, 1)
                _record(best, iters=iters, **extras)
                _note(f"mixed3 (wav+mp3+flac): {best_3:.0f}x")
        except Exception as e:
            _note(f"flac secondary skipped: {e!r}")

    watchdog.cancel()
    _emit_and_exit(0)


if __name__ == "__main__":
    main()
