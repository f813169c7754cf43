#!/usr/bin/env python
"""On-chip probe: Pallas entropy scan vs the XLA scans.

Compiles huffman_pallas.entropy_scan with interpret=False on the real
TPU, checks (lines, fail) BIT-EXACT against decode_spectra(impl="xla")
on a lame-encoded stream at the benchmark lane scale, and times both
fused MP3 programs (net of wire: arrays pre-staged on device, timing
through a forcing fetch).

Usage: python tools/mp3_scan_probe.py [seconds-per-file [n-files]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402


def main() -> int:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
    except Exception:
        pass

    import codec_refs as CR
    from audio_decoder_tpu.codecs.mpeg import frontend as FE
    from audio_decoder_tpu.codecs.mpeg.dsp import mp3_decode_fused

    if not CR.have_lame():
        print("no lame; cannot probe")
        return 1

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    rng = np.random.default_rng(3)
    n = int(44100 * secs)
    t = np.arange(n) / 44100.0
    s = (
        0.5 * np.sin(2 * np.pi * 220.0 * t)
        + 0.25 * np.sin(2 * np.pi * 693.0 * t)
        + 0.1 * rng.standard_normal(n)
    )
    pcm = np.clip(
        np.stack([s, np.roll(s, 41) * 0.8], 1) * 24000, -32768, 32767
    ).astype(np.int16)
    blob = CR.lame_encode(pcm, 44100, 192, mode=1)
    ln = FE.analyze_lanes(blob)
    G, C = ln.n_granules, ln.channels
    print(f"stream: {len(blob)} B, {G} granule-lanes x {C} ch")

    from audio_decoder_tpu.codecs.mpeg.dsp import compact_lane_wire

    L = G * C
    end_rel, lim_rel, exp_base, exp_d, ok = compact_lane_wire(
        ln.start_bit, ln.end_bit, ln.limit_bit, ln.exp_b, ln.blockcfg,
        np.full((1,), ln.rate_idx, np.int32))
    assert ok.all()
    one = [
        np.asarray(ln.main_data)[None],
        ln.start_bit.reshape(1, L), end_rel.reshape(1, L),
        lim_rel.reshape(1, L), ln.big_values.reshape(1, L),
        ln.region1.reshape(1, L), ln.region2.reshape(1, L),
        ln.tsel.reshape(1, L * 3), ln.c1sel.reshape(1, L),
        ln.valid.reshape(1, L), exp_base.reshape(1, L),
        exp_d.reshape(1, L * 61), ln.blockcfg.reshape(1, L),
        ln.st_flags.reshape(1, G), ln.sfr_bands.reshape(1, G * 61),
        np.asarray([ln.rate_idx], np.int32),
    ]
    args = [jnp.asarray(np.repeat(a, n_files, axis=0)) for a in one]
    kw = dict(channels=C, joint_stereo=ln.joint_stereo)
    args = [jax.device_put(a) for a in args]
    jax.block_until_ready(args[0])

    def run(impl):
        t0 = time.perf_counter()
        out = mp3_decode_fused(*args, **kw, impl=impl)
        jax.block_until_ready(out)
        c = time.perf_counter() - t0
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = mp3_decode_fused(*args, **kw, impl=impl)
            float(jnp.asarray(out)[0, -1])  # forcing fetch
            ts.append(time.perf_counter() - t0)
        return np.asarray(out), c, min(ts)

    out_x, comp_x, t_x = run("xla")
    print(f"xla:    compile+first {comp_x:.1f}s  best {t_x*1e3:.1f} ms")
    out_p, comp_p, t_p = run("pallas")
    print(f"pallas: compile+first {comp_p:.1f}s  best {t_p*1e3:.1f} ms")

    if np.array_equal(out_x, out_p):
        audio = n_files * G * 576 * (1 if ln.rate_idx >= 3 else 1) / 44100.0
        print(f"BIT-EXACT over {out_x.size} samples; "
              f"{audio:.0f} audio-sec → xla {audio/t_x:.0f}x, "
              f"pallas {audio/t_p:.0f}x net-of-wire")
        return 0
    diff = np.flatnonzero((out_x != out_p).reshape(-1))
    print(f"MISMATCH: {diff.size} samples differ, first at {diff[:8]}")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
