"""FLAC dual-oracle foundation (ROADMAP round-3 item 1).

Two clear-room implementations — tests/flac_writer.py (encoder) and
tests/flac_ref.py (decoder), both written from the public spec (RFC
9639) — are cross-validated against libavcodec's independent FLAC
decoder: every crafted stream must decode BIT-EXACTLY (FLAC is
lossless) through both our reference decoder and ffmpeg's.  This is the
same dual-oracle discipline the ADPCM families used, laid down ahead of
the round-3 device FLAC codec so each device decode path (rice scan,
fixed-predictor prefix sums, LPC IIR, stereo decorrelation) will have
feature-isolated conformance vectors from day one.
"""

from __future__ import annotations

import numpy as np
import pytest

from . import flac_ref as FR
from . import flac_writer as FW
from .codec_refs import have_ffdec

SUBFRAME_CASES = [
    ("verbatim", dict(kind="verbatim")),
    ("constant", dict(kind="constant")),
    ("fixed0", dict(kind="fixed", order=0)),
    ("fixed1", dict(kind="fixed", order=1)),
    ("fixed2", dict(kind="fixed", order=2)),
    ("fixed3", dict(kind="fixed", order=3)),
    ("fixed4", dict(kind="fixed", order=4)),
    ("fixed2_part4", dict(kind="fixed", order=2, partition_order=2)),
    ("fixed2_rice2", dict(kind="fixed", order=2, method=1)),
    ("fixed1_escape", dict(kind="fixed", order=1, escape_bits=19)),
    ("lpc3", dict(kind="lpc", lpc_coefs=[1228, -819, 410], lpc_shift=10)),
    ("lpc1_shift0", dict(kind="lpc", lpc_coefs=[1024], lpc_shift=10)),
    ("fixed2_wasted", dict(kind="fixed", order=2, wasted=3)),
]
STEREO_MODES = ["independent", "left_side", "right_side", "mid_side"]


def _material(rng, frames=700, ch=2, hi=30000, kw=None):
    if kw and kw.get("kind") == "constant":
        x = np.full((frames, ch), -(hi // 3), np.int32)
    else:
        x = rng.integers(-hi, hi, size=(frames, ch)).astype(np.int32)
    if kw and kw.get("wasted"):
        x = (x >> kw["wasted"]) << kw["wasted"]
    return x


def _check(blob, x, bps):
    ref, info = FR.decode_file(blob)
    np.testing.assert_array_equal(ref, x)  # clear-room decoder
    if have_ffdec():
        from .codec_refs import ffdec_decode_flac

        got, rate = ffdec_decode_flac(blob, bps)
        np.testing.assert_array_equal(got, x)  # independent decoder


@pytest.mark.parametrize("name,kw", SUBFRAME_CASES)
@pytest.mark.parametrize("stereo", STEREO_MODES)
def test_subframe_matrix(rng, name, kw, stereo):
    x = _material(rng, kw=kw)
    blob = FW.encode_file(x, 44100, 16, blocksize=256, stereo=stereo,
                          subframe_kw=kw)
    _check(blob, x, 16)


@pytest.mark.parametrize("bps,hi", [(8, 127), (16, 1 << 15), (24, 1 << 23)])
def test_sample_sizes(rng, bps, hi):
    x = _material(rng, frames=1500, ch=1, hi=hi)
    _check(FW.encode_file(x, 48000, bps, blocksize=576), x, bps)


def test_partial_tail_frame_and_odd_rate(rng):
    # 1000 = 1×576 + 424-sample tail (blocksize code 7, u16 field);
    # 12345 Hz has no rate code (header code 0 → streaminfo rate)
    x = _material(rng, frames=1000)
    blob = FW.encode_file(x, 12345, 16, blocksize=576, stereo="mid_side")
    ref, info = FR.decode_file(blob)
    assert info["rate"] == 12345
    np.testing.assert_array_equal(ref, x)


def test_lpc_order_32(rng):
    coefs = [512] + [0] * 30 + [256]  # sparse high-order predictor
    kw = dict(kind="lpc", lpc_coefs=coefs, lpc_shift=11)
    x = _material(rng, frames=900)
    _check(FW.encode_file(x, 44100, 16, blocksize=448, subframe_kw=kw), x, 16)


def test_many_frames_utf8_numbers(rng):
    # >128 frames exercises the 2-byte UTF-8-style frame number form
    x = _material(rng, frames=192 * 130, ch=1, hi=2000)
    blob = FW.encode_file(x, 44100, 16, blocksize=192)
    ref, _ = FR.decode_file(blob)
    np.testing.assert_array_equal(ref, x)


def test_crc_corruption_detected(rng):
    x = _material(rng, frames=256, ch=1)
    blob = bytearray(FW.encode_file(x, 44100, 16, blocksize=256))
    info = FR.parse_streaminfo(bytes(blob))
    hdr = info["frames_start"]
    blob[hdr + 4] ^= 0x10  # inside the frame header → CRC-8 trips
    with pytest.raises(ValueError, match="CRC"):
        FR.decode_file(bytes(blob))
    blob[hdr + 4] ^= 0x10
    blob[-3] ^= 0x01  # inside the last frame body → CRC-16 trips
    with pytest.raises(ValueError, match="CRC"):
        FR.decode_file(bytes(blob))


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_mixed_feature_streams(seed):
    # every frame gets a different subframe layout (cycled), stereo mode
    # and amplitude profile vary per seed — the shape of real streams,
    # and of the lane mix the round-3 device decoder will face
    r = np.random.default_rng(seed)
    kinds = [kw for _, kw in SUBFRAME_CASES]
    r.shuffle(kinds)
    stereo = STEREO_MODES[seed % 4]
    frames = int(r.integers(900, 2600))
    hi = int(r.integers(300, 30000))
    x = r.integers(-hi, hi, size=(frames, 2)).astype(np.int32)
    # quiet stretch + constant stretch, like silence/held notes
    x[100:200] = 0
    x[300:380] = 777
    blob = FW.encode_file(x, 44100, 16, blocksize=256, stereo=stereo,
                          subframe_kw=kinds)
    _check(blob, x, 16)


def test_streaminfo_fields(rng):
    x = _material(rng, frames=700)
    info = FR.parse_streaminfo(FW.encode_file(x, 96000, 16, blocksize=512))
    assert (info["rate"], info["channels"], info["bits"], info["total"]) == (
        96000, 2, 16, 700)
