"""On-device Huffman decode path: lane metadata + fused device decode.

Three layers of checks:
1. device entropy decode (huffman_device.decode_spectra) is BIT-EXACT
   against the host reference front-end's spectra;
2. the fused full-device decode (raw main_data bits → PCM in one jit,
   including device-derived stereo) matches the NumPy oracle and mpg123
   at float32 roundoff;
3. the C++ lane emitter (mp3fe_lanes_batch) is bit-identical to the
   Python analyze_lanes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_decoder_tpu.codecs.mpeg import frontend as FE
from audio_decoder_tpu.codecs.mpeg import huffman_device as HD
from audio_decoder_tpu.codecs.mpeg import native as NA
from audio_decoder_tpu.codecs.mpeg.dsp import mp3_decode_fused

from . import codec_refs as CR
from . import mp3_oracle as MO

pytestmark = pytest.mark.skipif(
    not (CR.have_lame() and CR.have_mpg123()),
    reason="system lame/mpg123 not available",
)

TOL = 5e-7


def _sig(kind: str, n: int, ch: int, sr: int = 44100) -> np.ndarray:
    rng = np.random.default_rng(29)
    t = np.arange(n)
    if kind == "transient":
        s = 0.2 * np.sin(2 * np.pi * 880 * t / sr)
        s[::4000] = 0.9
    else:
        s = 0.3 * rng.standard_normal(n)
    sig = np.stack([s] * ch, 1)
    if ch == 2:
        sig[:, 1] = np.roll(sig[:, 1], 17) * 0.8
    return np.clip(sig * 30000, -32768, 32767).astype(np.int16)


CASES = [
    ("noise", 2, 1, 128, 44100),
    ("transient", 2, 0, 320, 48000),
    ("transient", 2, 1, 128, 44100),
    ("noise", 1, None, 64, 44100),
    ("noise", 2, 0, 64, 32000),
]


def _fused_args(ln: "FE.Mp3Lanes") -> list:
    from audio_decoder_tpu.codecs.mpeg.dsp import compact_lane_wire

    G, C = ln.n_granules, ln.channels
    L = G * C
    end_rel, lim_rel, exp_base, exp_d, ok = compact_lane_wire(
        ln.start_bit, ln.end_bit, ln.limit_bit, ln.exp_b, ln.blockcfg,
        np.full((1,), ln.rate_idx, np.int32),
    )
    assert ok.all()  # spec-legal lame streams always ship exactly
    return [
        jnp.asarray(ln.main_data)[None],
        jnp.asarray(ln.start_bit.reshape(1, L)),
        jnp.asarray(end_rel.reshape(1, L)),
        jnp.asarray(lim_rel.reshape(1, L)),
        jnp.asarray(ln.big_values.reshape(1, L)),
        jnp.asarray(ln.region1.reshape(1, L)),
        jnp.asarray(ln.region2.reshape(1, L)),
        jnp.asarray(ln.tsel.reshape(1, L * 3)),
        jnp.asarray(ln.c1sel.reshape(1, L)),
        jnp.asarray(ln.valid.reshape(1, L)),
        jnp.asarray(exp_base.reshape(1, L)),
        jnp.asarray(exp_d.reshape(1, L * 61)),
        jnp.asarray(ln.blockcfg.reshape(1, L)),
        jnp.asarray(ln.st_flags.reshape(1, G)),
        jnp.asarray(ln.sfr_bands.reshape(1, G * 61)),
        jnp.asarray([ln.rate_idx], jnp.int32),
    ]


def _fused(ln: "FE.Mp3Lanes") -> np.ndarray:
    G, C = ln.n_granules, ln.channels
    pcm = mp3_decode_fused(
        *_fused_args(ln), channels=C, joint_stereo=ln.joint_stereo
    )
    # kernel emits flat interleaved [B, S*C]; host reshape is free
    return np.asarray(pcm[0]).reshape(-1, C)


@pytest.mark.parametrize("kind,ch,mode,bitrate,sr", CASES)
def test_device_huffman_bitexact_vs_host(kind, ch, mode, bitrate, sr):
    blob = CR.lame_encode(_sig(kind, int(sr * 0.25), ch, sr), sr, bitrate, mode=mode)
    ref = FE.analyze(blob)
    ln = FE.analyze_lanes(blob)
    G, C = ln.n_granules, ln.channels
    N = G * C
    short = (ln.blockcfg & 3) == 2
    cfg = np.where(short, np.where((ln.blockcfg >> 2) == 1, 2, 1), 0)
    lines, fail = HD.decode_spectra(
        jnp.asarray(ln.main_data)[None],
        jnp.zeros(N, jnp.int32),
        jnp.asarray(ln.start_bit.reshape(-1)),
        jnp.asarray(ln.end_bit.reshape(-1)),
        jnp.asarray(ln.limit_bit.reshape(-1)),
        jnp.asarray(ln.big_values.reshape(-1), jnp.int32),
        jnp.asarray(ln.region1.reshape(-1), jnp.int32),
        jnp.asarray(ln.region2.reshape(-1), jnp.int32),
        jnp.asarray(ln.tsel.reshape(-1, 3), jnp.int32),
        jnp.asarray(ln.c1sel.reshape(-1), jnp.int32),
        jnp.asarray(ln.valid.reshape(-1), jnp.int32),
        jnp.full((N,), ln.rate_idx, jnp.int32),
        jnp.asarray(cfg.reshape(-1), jnp.int32),
    )
    assert int(np.asarray(fail).sum()) == 0
    np.testing.assert_array_equal(np.asarray(lines).reshape(G, C, 576), ref.is_q)


@pytest.mark.parametrize("kind,ch,mode,bitrate,sr", CASES)
def test_fused_device_decode_matches_oracle(kind, ch, mode, bitrate, sr):
    blob = CR.lame_encode(_sig(kind, int(sr * 0.25), ch, sr), sr, bitrate, mode=mode)
    mine = _fused(FE.analyze_lanes(blob))
    ref, _ = MO.decode(blob)
    n = min(len(ref), len(mine))
    assert n > sr // 10
    rms = float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean()))
    assert rms < TOL, f"oracle rms {rms}"
    mref, _ = CR.mpg123_decode(blob)
    n = min(len(mref), len(mine))
    rms = float(np.sqrt(((mref[:n] - mine[:n]) ** 2).mean()))
    assert rms < TOL, f"mpg123 rms {rms}"


@pytest.mark.skipif(not NA.available(), reason="native toolchain unavailable")
@pytest.mark.parametrize("kind,ch,mode,bitrate,sr", CASES[:3])
def test_native_lanes_bitexact_vs_python(kind, ch, mode, bitrate, sr):
    blob = CR.lame_encode(_sig(kind, int(sr * 0.25), ch, sr), sr, bitrate, mode=mode)
    ln = FE.analyze_lanes(blob)
    M = (len(ln.main_data) + 3) // 4 * 4
    r = NA.lanes_batch([blob], ln.n_granules, M, ln.channels)
    np.testing.assert_array_equal(r["main"][0][: len(ln.main_data)], ln.main_data)
    np.testing.assert_array_equal(r["start"][0], ln.start_bit)
    np.testing.assert_array_equal(r["end"][0], ln.end_bit)
    np.testing.assert_array_equal(r["limit"][0], ln.limit_bit)
    np.testing.assert_array_equal(r["big"][0], ln.big_values)
    np.testing.assert_array_equal(r["r1"][0], ln.region1)
    np.testing.assert_array_equal(r["r2"][0], ln.region2)
    np.testing.assert_array_equal(r["tsel"][0], ln.tsel)
    np.testing.assert_array_equal(r["c1sel"][0], ln.c1sel)
    np.testing.assert_array_equal(r["valid"][0], ln.valid)
    np.testing.assert_array_equal(r["exp_b"][0], ln.exp_b)
    np.testing.assert_array_equal(r["cfg"][0], ln.blockcfg)
    np.testing.assert_array_equal(r["stflags"][0], ln.st_flags)
    np.testing.assert_array_equal(r["sfr"][0], ln.sfr_bands)


# ---------------------------------------------------------------------------
# Lane bucketing (decoder._plan_buckets + mp3_decode_fused buckets path)
# ---------------------------------------------------------------------------


def test_plan_buckets_heuristic():
    from audio_decoder_tpu.codecs.mpeg.decoder import _plan_buckets

    # skewed: 10% dense lanes, 90% near-empty → split with a short cap
    bv = np.zeros(640, np.int16)
    bv[:64] = 200
    valid = np.ones(640, np.int8)
    perm, buckets = _plan_buckets(bv, valid, 224)
    assert perm is not None and len(buckets) >= 2
    assert sum(c for c, _p, _q in buckets) == 640
    # bucket invariant: every lane in bucket i fits its pair cap
    start = 0
    sbv = bv[perm]
    for cnt, cap, _q in buckets:
        assert (sbv[start : start + cnt] <= cap).all()
        start += cnt
    # permutation is a bijection over all lanes
    assert (np.sort(perm) == np.arange(640)).all()

    # uniformly dense → no split, no permutation
    p1, b1 = _plan_buckets(np.full(640, 220, np.int16), valid, 224)
    assert p1 is None and len(b1) == 1 and b1[0][1] == 224
    # uniformly sparse → single short bucket, no permutation
    p0, b0 = _plan_buckets(np.full(640, 3, np.int16), valid, 224)
    assert p0 is None and len(b0) == 1 and b0[0][1] == 32
    # invalid lanes don't force the big bucket
    bv2 = np.full(640, 500, np.int16)
    ok = np.zeros(640, np.int8)
    p2, b2 = _plan_buckets(bv2, ok, 512)
    assert p2 is None and b2[0][1] == 32


def test_compact_lane_wire_extremes():
    """The uint8 exponent-delta wire format must be exact for every slot
    the band→line map can SELECT, even at the ISO field extremes where
    the emitters leave unselectable slots at 0 — up to 398 quarter-steps
    above the quietest used bands.  Mixed blocks are the trap: they
    select only long 0..7 (0..5 LSF) plus the short slots past the
    split, so 'all 61 slots' masking would overflow on legal quiet
    mixed-block granules (found by review; this pins the fix)."""
    from audio_decoder_tpu.codecs.mpeg.dsp import _USED_SLOTS, compact_lane_wire

    r0 = 0  # 44.1 kHz
    used_mixed = _USED_SLOTS[r0, 2]
    assert not used_mixed[8:22].any() and not used_mixed[22:31].any()

    e = np.zeros((4, 61), np.int16)
    bc = np.zeros(4, np.int8)
    # lane 0: long block, gg floor with max scalefac spread: [-398, -210]
    e[0, :22] = np.linspace(-398, -210, 22).astype(np.int16)
    # lane 1: short block at the positive ceiling
    bc[1] = 2
    e[1, 22:] = 45
    # lane 2: QUIET MIXED block (gg=30, scalefac_scale=1, sbg=7, sf=15):
    # used exponents at -296, unselectable slots left 0 by the emitter
    bc[2] = 2 | 4
    e[2, used_mixed] = -296
    # lane 3: corrupt — used-slot range beyond uint8 → must flag, not crash
    e[3, :22] = np.linspace(-300, 45, 22).astype(np.int16)
    start = np.array([0, 100, 200, 300], np.int64)
    end = start + np.array([4095, 0, 70000, 10])  # lane 2: clamp at 65535
    limit = end + 5
    rate = np.full(4, r0, np.int32)
    end_rel, lim_rel, base, d, ok = compact_lane_wire(
        start, end, limit, e, bc, rate
    )
    assert end_rel.dtype == np.uint16 and d.dtype == np.uint8
    assert end_rel[2] == 65535  # clamped, beyond any reachable bit position
    # reconstruct exactly what the device computes, over selectable slots
    rec = base[:, None].astype(np.int32) - d
    assert (rec[0, :22] == e[0, :22]).all()
    assert (rec[1, 22:] == e[1, 22:]).all()
    assert (rec[2, used_mixed] == -296).all()
    assert list(ok) == [True, True, True, False]
    # an all-padded (invalid) lane stays representable
    _, _, b0, d0, ok0 = compact_lane_wire(
        np.zeros(1), np.zeros(1), np.zeros(1), np.zeros((1, 61), np.int16),
        np.zeros(1, np.int8), np.zeros(1, np.int32),
    )
    assert b0[0] == 0 and (d0 == 0).all() and ok0.all()


def test_fused_split_matches_unsplit():
    # force the bucketed program and require bit-identical PCM vs the
    # single-scan program on a real lame stream
    blob = CR.lame_encode(_sig("transient", 11025, 2), 44100, 128, mode=1)
    ln = FE.analyze_lanes(blob)
    G, C = ln.n_granules, ln.channels
    L = G * C
    args = _fused_args(ln)
    kw = dict(channels=C, joint_stereo=ln.joint_stereo, n_big=288)
    base = np.asarray(mp3_decode_fused(*args, **kw))
    bv = ln.big_values.reshape(-1).astype(np.int64)
    order = np.argsort(-bv, kind="stable").astype(np.int32)
    k = max(32, int(np.count_nonzero(bv > 96)))
    k2 = max(k + 1, int(np.count_nonzero(bv > 32)))
    split = np.asarray(mp3_decode_fused(
        *args, jnp.asarray(order), **kw,
        buckets=((k, 288, 144), (k2 - k, 96, 144), (L - k2, 32, 144)),
    ))
    assert np.array_equal(base, split)
