"""FLAC *encoder* conformance (audio_decoder_tpu/codecs/flac/encode.py).

The production encoder (device analysis + host token packing) is pinned
three ways on every stream it emits:

  1. tests/flac_ref.py — the clear-room spec decoder — must reproduce
     the source integers bit-exactly (FLAC is lossless);
  2. libavcodec's independent FLAC decoder must agree (when available);
  3. our OWN device decoder must round-trip decode → encode → decode
     bit-exactly, including the stamped STREAMINFO MD5.

Content is chosen to force every encoder decision path: noise (order-0,
rice method 1 at 24-bit), tonal material (high orders, mid/side),
silence (CONSTANT), hard pans (left/side vs side/right), partial tail
frames, non-table blocksizes, and 1-sample streams.
"""

from __future__ import annotations

import numpy as np
import pytest

from audio_decoder_tpu.codecs.flac.encode import encode_flac
from audio_decoder_tpu.codecs.flac import frontend
from audio_decoder_tpu.io.encode import export_batch, write_audio

from . import flac_ref as FR
from .codec_refs import have_ffdec
from .test_flac_device import _device_decode


def _check_all(blob: bytes, x: np.ndarray, bits: int, rate: int = 44100):
    """Every oracle we have, plus MD5, on one encoded stream."""
    ref, info = FR.decode_file(blob)
    np.testing.assert_array_equal(ref, x)
    assert info["rate"] == rate and info["bits"] == bits
    assert info["total"] == x.shape[0]
    an = frontend.analyze(blob)
    assert frontend.verify_md5(an, x.astype(np.int64)) is True
    if have_ffdec():
        from .codec_refs import ffdec_decode_flac

        got, grate = ffdec_decode_flac(blob, bits)
        np.testing.assert_array_equal(got, x)
        assert grate == rate
    ints, err = _device_decode([blob])[0]
    assert err == 0
    np.testing.assert_array_equal(ints, x.astype(np.int64))


def _pcm(x: np.ndarray, bits: int) -> np.ndarray:
    return x.astype(np.float32) / np.float32(2.0 ** (bits - 1))


def _tone(S, C, amp, rng, bits):
    t = np.arange(S) / 44100.0
    s = (np.sin(2 * np.pi * 220.0 * t) * amp
         + np.sin(2 * np.pi * 333.3 * t) * amp * 0.4
         + rng.standard_normal(S) * amp * 0.01)
    cols = [s * (1.0 - 0.15 * c) for c in range(C)]
    hi = 2 ** (bits - 1) - 1
    return np.clip(np.stack(cols, 1), -hi - 1, hi).astype(np.int64)


@pytest.mark.parametrize("bits", [8, 16, 24])
@pytest.mark.parametrize("content", ["noise", "tone", "silence"])
def test_roundtrip_stereo(rng, bits, content):
    S = 5000
    hi = 2 ** (bits - 1)
    if content == "noise":
        x = rng.integers(-hi, hi, size=(S, 2)).astype(np.int64)
    elif content == "tone":
        x = _tone(S, 2, hi * 0.4, rng, bits)
    else:
        x = np.zeros((S, 2), np.int64)
    blob = encode_flac(_pcm(x, bits), 44100, bits=bits, blocksize=1024)
    _check_all(blob, x, bits)
    if content == "silence":  # CONSTANT frames collapse to ~nothing
        assert len(blob) < 300
    if content == "tone":     # predictors must actually compress
        assert len(blob) < S * 2 * (bits // 8) * 0.75


@pytest.mark.parametrize("channels", [1, 3, 6])
def test_roundtrip_multichannel(rng, channels):
    x = _tone(3000, channels, 9000, rng, 16)
    blob = encode_flac(_pcm(x, 16), 48000, bits=16, blocksize=512)
    _check_all(blob, x, 16, rate=48000)


@pytest.mark.parametrize("S,blocksize", [
    (4096, 4096),    # exactly one table-coded frame
    (4097, 4096),    # 1-sample tail frame
    (1000, 192),     # table blocksize + partial tail
    (5000, 1000),    # non-table blocksize (16-bit header field)
    (700, 1024),     # single short frame
    (1, 256),        # single 1-sample stream
    (3, 256),        # shorter than any predictor order
])
def test_frame_geometry(rng, S, blocksize):
    x = rng.integers(-(2 ** 14), 2 ** 14, size=(S, 2)).astype(np.int64)
    blob = encode_flac(_pcm(x, 16), 44100, bits=16, blocksize=blocksize)
    _check_all(blob, x, 16)


def test_nontable_sample_rate(rng):
    # rate code 0: decoders must fall back to the STREAMINFO rate
    x = rng.integers(-(2 ** 12), 2 ** 12, size=(1500, 2)).astype(np.int64)
    blob = encode_flac(_pcm(x, 16), 12345, bits=16, blocksize=256)
    _check_all(blob, x, 16, rate=12345)


def test_stereo_mode_selection(rng):
    """Each correlation structure must pick the mode built for it and
    still round-trip exactly."""
    S = 4096
    mono = rng.integers(-20000, 20000, size=S).astype(np.int64)

    def modes_of(blob):
        an = frontend.analyze(blob)
        return set(np.asarray(an.ch_mode).tolist())

    # identical channels → side is constant 0 → left/side or mid/side
    x = np.stack([mono, mono], 1)
    blob = encode_flac(_pcm(x, 16), 44100, bits=16)
    _check_all(blob, x, 16)
    assert modes_of(blob) <= {8, 9, 10}

    # independent noise → no decorrelation gain; independent and
    # mid/side are a genuine near-tie here (mid is ~0.5 bit/sample
    # cheaper, side ~0.5 dearer), so either pick is optimal-ish
    x = rng.integers(-20000, 20000, size=(S, 2)).astype(np.int64)
    blob = encode_flac(_pcm(x, 16), 44100, bits=16)
    _check_all(blob, x, 16)
    assert modes_of(blob) <= {0, 10}

    # left loud noise, right quiet → right channel cheap → left/side
    # beats mid/side (mid inherits the loud channel's entropy)
    x = np.stack([rng.integers(-20000, 20000, size=S),
                  rng.integers(-8, 8, size=S)], 1).astype(np.int64)
    blob = encode_flac(_pcm(x, 16), 44100, bits=16)
    _check_all(blob, x, 16)


def test_rice_method1_high_bps(rng):
    """24-bit noise needs rice parameters > 14 → 5-bit (method-1)
    parameter fields on the wire."""
    x = rng.integers(-(2 ** 23), 2 ** 23, size=(3000, 2)).astype(np.int64)
    blob = encode_flac(_pcm(x, 24), 96000, bits=24, blocksize=1024)
    _check_all(blob, x, 24, rate=96000)
    an = frontend.analyze(blob)
    assert int(np.asarray(an.rl_param).max()) > 14


def test_mixed_content_sections(rng):
    """Silence / tone / noise sections in one stream exercise CONSTANT,
    high-order FIXED and order-0 frames side by side."""
    S = 3 * 2048
    x = np.zeros((S, 2), np.int64)
    x[2048:4096] = _tone(2048, 2, 12000, rng, 16)
    x[4096:] = rng.integers(-30000, 30000, size=(2048, 2))
    blob = encode_flac(_pcm(x, 16), 44100, bits=16, blocksize=512)
    _check_all(blob, x, 16)


def test_decode_encode_decode_idempotent(rng):
    """Our decoder's f32 output re-encodes to the same integers (the
    quantizer inverts the decoder's 2^(1-bits) scaling exactly)."""
    x = _tone(6000, 2, 14000, rng, 16)
    blob = encode_flac(_pcm(x, 16), 44100, bits=16)
    ints, err = _device_decode([blob])[0]
    assert err == 0
    pcm = ints.astype(np.float32) / np.float32(2.0 ** 15)
    blob2 = encode_flac(pcm, 44100, bits=16)
    ints2, err2 = _device_decode([blob2])[0]
    assert err2 == 0
    np.testing.assert_array_equal(ints2, x.astype(np.int64))


def test_dither_bounded_error(rng):
    """Seeded TPDF dither: reproducible bytes, error ≤ 1.5 LSB."""
    t = np.arange(8000) / 44100.0
    pcm = np.stack([0.3 * np.sin(2 * np.pi * 441.0 * t),
                    0.2 * np.sin(2 * np.pi * 127.0 * t)], 1)
    pcm = pcm.astype(np.float32)
    b1 = encode_flac(pcm, 44100, bits=16, dither=11)
    b2 = encode_flac(pcm, 44100, bits=16, dither=11)
    assert b1 == b2
    ref, _ = FR.decode_file(b1)
    err = ref / 2.0 ** 15 - pcm.astype(np.float64)
    assert np.max(np.abs(err)) <= 1.5 * 2.0 ** -15


def test_export_batch_flac_and_write_audio(rng, tmp_path):
    """The io surface routes .flac: export_batch(decode_dir's inverse)
    and write_audio both produce streams our registry decodes back."""
    from audio_decoder_tpu.codecs.registry import decode_paths

    x = _tone(2500, 2, 11000, rng, 16)
    p = tmp_path / "t.flac"
    write_audio(str(p), _pcm(x, 16), 44100, bits=16, blocksize=512)
    batch = decode_paths([str(p)])
    assert int(batch.err[0]) == 0
    got = np.round(np.asarray(
        batch.pcm[0, : int(batch.valid_frames[0])], np.float64) * 2.0 ** 15)
    np.testing.assert_array_equal(got.astype(np.int64), x)

    out = export_batch(str(tmp_path / "out"), batch, {"t": 0},
                       container="flac")
    assert set(out) == {"t"}
    again = decode_paths([out["t"]])
    np.testing.assert_array_equal(np.asarray(again.pcm[0]),
                                  np.asarray(batch.pcm[0]))


def test_encode_validation():
    pcm = np.zeros((100, 2), np.float32)
    with pytest.raises(ValueError):
        encode_flac(pcm, 44100, bits=13)
    with pytest.raises(ValueError):
        encode_flac(pcm, 44100, blocksize=8)
    with pytest.raises(ValueError):
        encode_flac(pcm, 0)
    with pytest.raises(ValueError):
        encode_flac(np.zeros((100, 9), np.float32), 44100)
    with pytest.raises(ValueError):
        encode_flac(np.zeros((0, 2), np.float32), 44100)


def _music(rng, S, C=2, rate=44100):
    """Correlated tonal material with noise — the content class LPC
    analysis exists for."""
    t = np.arange(S) / rate
    m = sum(a * np.sin(2 * np.pi * f * t + 0.1 * np.sin(2 * np.pi * 3 * t))
            for f, a in ((82.4, 0.3), (164.8, 0.22), (329.6, 0.18),
                         (659.3, 0.08), (1318.5, 0.04)))
    m = m * (0.6 + 0.4 * np.sin(2 * np.pi * 1.7 * t))
    m = m + 0.004 * rng.standard_normal(S)
    x = np.stack([m, np.roll(m, 7) * 0.9][:C], 1)
    return np.clip(np.round(x * 2.0 ** 15 * 0.6),
                   -2 ** 15, 2 ** 15 - 1).astype(np.int64)


def test_lpc_subframes_emitted_and_exact(rng):
    """Default analysis (lpc_order=8) must actually choose LPC subframes
    on tonal content and survive every oracle (incl. our device decoder
    — the LPC path exercises quantized coefficients with shift > 0)."""
    x = _music(rng, 30000)
    blob = encode_flac(_pcm(x, 16), 44100, bits=16, blocksize=4096)
    _check_all(blob, x, 16)
    an = frontend.analyze(blob)
    # sub_kind 0 with a nonzero shift ⇔ a real LPC subframe
    assert np.any((np.asarray(an.sub_kind) == 0)
                  & (np.asarray(an.sub_shift) > 0)), "no LPC subframes"
    # and LPC must beat the FIXED-only stream on this content
    fixed_blob = encode_flac(_pcm(x, 16), 44100, bits=16, blocksize=4096,
                             lpc_order=0)
    assert len(blob) < len(fixed_blob)


def test_lpc_order_zero_fixed_only(rng):
    """lpc_order=0 restores the FIXED/CONSTANT/VERBATIM-only encoder."""
    x = _music(rng, 12000)
    blob = encode_flac(_pcm(x, 16), 44100, bits=16, lpc_order=0)
    _check_all(blob, x, 16)
    an = frontend.analyze(blob)
    assert np.all(np.asarray(an.sub_shift) == 0)
    with pytest.raises(ValueError):
        encode_flac(_pcm(x, 16), 44100, lpc_order=40)


@pytest.mark.skipif(not have_ffdec(), reason="libavcodec unavailable")
def test_compression_vs_libav_level5(rng):
    """VERDICT r2 #3 completion bar: compression within ~10% of
    ``flac -5`` on music-like content, measured against libavcodec's
    encoder at compression_level 5."""
    from .codec_refs import ffdec_encode_flac_size

    x = _music(rng, 44100 * 3)
    blob = encode_flac(_pcm(x, 16), 44100, bits=16)
    ref = ffdec_encode_flac_size(x.astype(np.int32), 44100, 16, 5)
    assert len(blob) <= 1.10 * ref, (len(blob), ref)


@pytest.mark.skipif(not have_ffdec(), reason="libavcodec unavailable")
@pytest.mark.parametrize("bits", [16, 24])
def test_lpc_noise_and_quiet_exact(rng, bits):
    """Adversarial LPC content: incompressible noise (k-floor region,
    rice escapes) and near-silence (deep shifts) — both bit-exact
    through every oracle."""
    hi = 2 ** (bits - 1)
    for amp in (0.55 * hi, 12.0):
        x = np.clip(np.round(rng.standard_normal((22050, 2)) * amp),
                    -hi, hi - 1).astype(np.int64)
        blob = encode_flac(_pcm(x, bits), 44100, bits=bits)
        _check_all(blob, x, bits)


@pytest.mark.skipif(not have_ffdec(), reason="libavcodec unavailable")
def test_compression_vs_libav_level8(rng):
    """VERDICT r3 #5 completion bar: the -8-class search (order 12 +
    the tukey/partial_tukey/punchout_tukey apodization bank, every
    (window, order) pair competing per frame) lands within 5% of
    libavcodec's FLAC encoder at compression_level 8 on music — and the
    stream still round-trips bit-exactly through all three decoders."""
    from .codec_refs import ffdec_encode_flac_size

    x = _music(rng, 44100 * 3)
    blob = encode_flac(_pcm(x, 16), 44100, bits=16, level=8)
    ref = ffdec_encode_flac_size(x.astype(np.int32), 44100, 16, 8)
    assert len(blob) <= 1.05 * ref, (len(blob), ref)
    _check_all(blob, x, 16)


def test_level8_transients_beat_single_window(rng):
    """Non-stationary content is what the partial/punchout windows are
    FOR: percussive transients inside otherwise-tonal frames.  The
    level-8 bank must never lose to the level-5 single window (same
    modeled-bits grid, strictly larger search space) and the order-12
    ladder must actually engage (some subframe picks order > 8)."""
    x = _music(rng, 44100)
    # drop percussive bursts mid-frame so a whole-block window fits badly
    for pos in range(2000, x.shape[0] - 300, 4096):
        burst = (rng.standard_normal((128, 2)) * 9000).astype(np.int64)
        x[pos:pos + 128] += burst
    x = np.clip(x, -2 ** 15, 2 ** 15 - 1)
    b5 = encode_flac(_pcm(x, 16), 44100, bits=16, level=5)
    b8 = encode_flac(_pcm(x, 16), 44100, bits=16, level=8)
    assert len(b8) <= len(b5)
    _check_all(b8, x, 16)
    an = frontend.analyze(b8)
    k, o = np.asarray(an.sub_kind), np.asarray(an.sub_order)
    assert np.any((k == 0) & (np.asarray(an.sub_shift) > 0) & (o > 8)), \
        "order-12 ladder never engaged"


def test_level_ladder_and_overrides(rng):
    """LEVELS ladder sanity: level 0 is FIXED-only, explicit lpc_order
    overrides the level, bad levels raise."""
    x = _music(rng, 9000)
    b0 = encode_flac(_pcm(x, 16), 44100, bits=16, level=0)
    an = frontend.analyze(b0)
    assert np.all(np.asarray(an.sub_shift) == 0)
    _check_all(b0, x, 16)
    bo = encode_flac(_pcm(x, 16), 44100, bits=16, level=0, lpc_order=8)
    assert np.any(np.asarray(frontend.analyze(bo).sub_shift) > 0)
    with pytest.raises(ValueError):
        encode_flac(_pcm(x, 16), 44100, bits=16, level=9)
