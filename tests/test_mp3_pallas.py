"""Pallas entropy-scan (huffman_pallas) vs the XLA scans: BIT-EXACT.

The Mosaic kernel replaces decode_spectra's big-values + count1 scan
loops on TPU; these tests pin (lines, fail) equality on real lame
streams, on bit-corrupted streams (fail paths: bad codes, part2_3
overrun), on reserved-table lanes and on invalid lanes — in interpret
mode on CPU (the TPU compile is exercised by tools/mp3_scan_probe.py
and the bench's MP3 path).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from . import codec_refs as CR  # noqa: E402
from audio_decoder_tpu.codecs.mpeg import frontend as FE  # noqa: E402
from audio_decoder_tpu.codecs.mpeg import huffman_device as HD  # noqa: E402
from audio_decoder_tpu.codecs.mpeg.dsp import mp3_decode_fused  # noqa: E402

pytestmark = pytest.mark.skipif(
    not CR.have_lame(), reason="system lame not available"
)


def _sig(kind: str, n: int, ch: int, sr: int = 44100) -> np.ndarray:
    rng = np.random.default_rng(77)
    t = np.arange(n) / sr
    if kind == "noise":
        s = 0.5 * rng.standard_normal(n)
    elif kind == "transient":
        s = np.zeros(n)
        s[:: sr // 37] = 0.9
        s += 0.05 * rng.standard_normal(n)
    else:
        s = 0.6 * np.sin(2 * np.pi * 440.0 * t) + 0.2 * np.sin(
            2 * np.pi * 1320.0 * t
        )
    if ch == 2:
        s = np.stack([s, np.roll(s, 31) * 0.8], 1)
    else:
        s = s[:, None]
    return np.clip(s * 30000, -32768, 32767).astype(np.int16)


# ONE static shape for every test in this module: the interpret-mode
# kernel's CPU XLA compile runs minutes per shape (the unrolled pair/
# quad bodies), so all cases share (N0 lanes, M0 main bytes) and the
# same (n_big, n_c1) statics — one compile, reused throughout.  n_big
# does not change the kernel graph (the pair loop has dynamic trips);
# n_c1 = 64 keeps two count1 steps (covers the step-chaining path) at
# 2/5 of the full unroll.  Full-cap shapes are exercised on real TPU
# hardware by tools/mp3_scan_probe.py.
N0 = 96
M0 = 32768
N_BIG, N_C1 = 512, 64


def _spectra_args(ln, tsel=None):
    G, C = ln.n_granules, ln.channels
    N = G * C
    short = (ln.blockcfg & 3) == 2
    cfg = np.where(short, np.where((ln.blockcfg >> 2) == 1, 2, 1), 0)

    def lane(a, width=None):
        a = np.asarray(a).reshape(N, -1) if width else np.asarray(
            a).reshape(N)
        out = np.zeros((N0,) + a.shape[1:], a.dtype)
        n = min(N, N0)
        out[:n] = a[:n]
        return jnp.asarray(out.astype(np.int32))

    main = np.zeros((1, M0), np.uint8)
    assert ln.main_data.size <= M0
    main[0, : ln.main_data.size] = ln.main_data
    valid = np.asarray(ln.valid).reshape(N).copy()
    return (
        jnp.asarray(main),
        jnp.zeros(N0, jnp.int32),
        lane(ln.start_bit),
        lane(ln.end_bit),
        lane(ln.limit_bit),
        lane(ln.big_values),
        lane(ln.region1),
        lane(ln.region2),
        lane((tsel if tsel is not None else ln.tsel), width=3),
        lane(ln.c1sel),
        lane(valid),
        jnp.full((N0,), ln.rate_idx, jnp.int32),
        lane(cfg),
    )


def _both(ln, tsel=None):
    args = _spectra_args(ln, tsel)
    lx, fx = HD.decode_spectra(*args, n_big=N_BIG, n_c1=N_C1, impl="xla")
    lp, fp = HD.decode_spectra(*args, n_big=N_BIG, n_c1=N_C1, impl="pallas")
    return (np.asarray(lx), np.asarray(fx)), (np.asarray(lp), np.asarray(fp))


@pytest.mark.parametrize(
    "kind,ch,mode,bitrate",
    [("tone", 2, 1, 128), ("noise", 2, 0, 320), ("transient", 1, 3, 64)],
)
def test_pallas_scan_bitexact_vs_xla(kind, ch, mode, bitrate):
    blob = CR.lame_encode(_sig(kind, 11025, ch), 44100, bitrate, mode=mode)
    ln = FE.analyze_lanes(blob)
    (lx, fx), (lp, fp) = _both(ln)
    np.testing.assert_array_equal(fx, fp)
    np.testing.assert_array_equal(lx, lp)
    # clean stream: no LIVE lane failed (the N0 padding lanes are
    # invalid by construction and always read as failed)
    nlive = min(ln.n_granules * ln.channels, N0)
    valid = np.asarray(ln.valid).reshape(-1)[:nlive] > 0
    assert fx[:nlive][valid].sum() == 0


def test_pallas_scan_bitexact_on_corrupt_streams():
    """Bit-flipped main_data: bad-code and part2_3-overrun fail paths
    must latch identically (including which lanes fail)."""
    blob = CR.lame_encode(_sig("noise", 11025, 2), 44100, 128, mode=1)
    ln = FE.analyze_lanes(blob)
    rng = np.random.default_rng(5)
    md = np.array(ln.main_data, copy=True)
    flips = rng.integers(0, md.size, size=max(64, md.size // 200))
    md[flips] ^= (1 << rng.integers(0, 8, size=flips.size)).astype(np.uint8)
    import dataclasses

    lnc = dataclasses.replace(ln, main_data=md)
    (lx, fx), (lp, fp) = _both(lnc)
    np.testing.assert_array_equal(fx, fp)
    np.testing.assert_array_equal(lx, lp)


def test_pallas_scan_reserved_and_invalid_lanes():
    blob = CR.lame_encode(_sig("tone", 8820, 2), 44100, 96, mode=1)
    ln = FE.analyze_lanes(blob)
    tsel = np.array(ln.tsel, copy=True).reshape(-1, 3)
    live = np.flatnonzero(ln.valid.reshape(-1) > 0)
    if live.size >= 2:
        tsel[live[0], 0] = 4   # reserved table select → lane fail
        tsel[live[1], 1] = 14  # reserved in region 1
    import dataclasses

    lnr = dataclasses.replace(ln, valid=np.array(ln.valid, copy=True))
    lnr.valid.reshape(-1)[live[-1:]] = 0  # one invalid lane
    (lx, fx), (lp, fp) = _both(lnr, tsel=tsel.reshape(ln.tsel.shape))
    np.testing.assert_array_equal(fx, fp)
    np.testing.assert_array_equal(lx, lp)


def test_pallas_scan_small_buckets():
    """Bucketed shapes: n_big/n_c1 below the lane maxima must clamp the
    decode identically (pairs beyond n_big undecoded in both paths).
    One extra (smaller) compiled shape — the only second shape in this
    module."""
    blob = CR.lame_encode(_sig("noise", 8820, 2), 44100, 192, mode=1)
    ln = FE.analyze_lanes(blob)
    args = _spectra_args(ln)
    lx, fx = HD.decode_spectra(*args, n_big=64, n_c1=32, impl="xla")
    lp, fp = HD.decode_spectra(*args, n_big=64, n_c1=32, impl="pallas")
    np.testing.assert_array_equal(np.asarray(fx), np.asarray(fp))
    np.testing.assert_array_equal(np.asarray(lx), np.asarray(lp))


def test_fused_program_pallas_matches_xla():
    """End-to-end fused program equality (decode + DSP) on both impls.
    Shares the module's (N_BIG, N_C1) statics to bound compile count —
    the count1 truncation at N_C1=64 is identical on both sides, and the
    equality covers the scan→requantize→synthesis plumbing."""
    from .test_mp3_device import _fused_args

    blob = CR.lame_encode(_sig("transient", 11025, 2), 44100, 128, mode=1)
    ln = FE.analyze_lanes(blob)
    args = _fused_args(ln)
    kw = dict(channels=ln.channels, joint_stereo=ln.joint_stereo,
              n_big=N_BIG, n_c1=N_C1)
    base = np.asarray(mp3_decode_fused(*args, **kw, impl="xla"))
    pal = np.asarray(mp3_decode_fused(*args, **kw, impl="pallas"))
    np.testing.assert_array_equal(base, pal)
