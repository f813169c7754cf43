"""MPEG-1 intensity stereo conformance, pinned to mpg123.

No mainstream encoder emits intensity stereo, so these tests craft
surgical streams with the bit writer (tests/mp3_writer.py): known
left-channel content in chosen bands, controlled right-channel
scalefactors (= is_pos), probing the exact transform through mpg123 and
requiring our full decode paths to match it.
"""

import numpy as np
import pytest

from audio_decoder_tpu.codecs.mpeg import decoder as MD
from audio_decoder_tpu.codecs.mpeg import tables as T
from audio_decoder_tpu.io.assets import Asset

from . import codec_refs as CR
from . import mp3_oracle as MO
from .mp3_writer import make_l3_frame

pytestmark = pytest.mark.skipif(
    not CR.have_mpg123(), reason="system mpg123 not available"
)

TOL = 2e-5  # crafted signals are loud (global_gain 240); relative ~1e-7


def _both_match_mpg123(blob: bytes):
    ref, _ = CR.mpg123_decode(blob)
    mine, _ = MO.decode(blob)
    n = min(len(ref), len(mine))
    scale = max(float(np.abs(ref).max()), 1e-9)
    rms_o = float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean())) / scale
    pieces = MD.decode_group([Asset(path="x", name="x", ext="mp3", data=blob)])
    f = pieces[0][1].file(0)
    n2 = min(len(ref), f.pcm.shape[0])
    rms_p = float(np.sqrt(((ref[:n2] - f.pcm[:n2]) ** 2).mean())) / scale
    return rms_o, rms_p


def _long_blob(mode_ext, is_pos, band=5, right_vals=(), right_sc=4):
    lb = T.SFB_LONG[44100]
    lo, hi = int(lb[band]), int(lb[band + 1])
    vals = np.zeros(hi + (hi % 2), np.int32)
    vals[lo:hi] = ([1, -1] * ((hi - lo + 1) // 2))[: hi - lo]
    # bands 11+ read slen2-width fields (2 bits at sc 14), so clamp there;
    # the probed content band (5) sits in the slen1 region either way
    sfs = (
        [is_pos] * 21 if is_pos < 8
        else [is_pos] * 11 + [min(is_pos, 3)] * 10
    )
    return make_l3_frame(
        sr=44100, mode=1, mode_ext=mode_ext,
        spectra=(vals, np.asarray(right_vals, np.int32)),
        scalefac=((), sfs), scalefac_compress=(0, right_sc),
        global_gain=(240, 210),
    ) * 12


@pytest.mark.parametrize("mode_ext", [1, 3])
@pytest.mark.parametrize("is_pos", [0, 2, 4, 6, 7])
def test_long_block_intensity(mode_ext, is_pos):
    rms_o, rms_p = _both_match_mpg123(_long_blob(mode_ext, is_pos))
    assert rms_o < TOL, f"oracle rms {rms_o}"
    assert rms_p < TOL, f"production rms {rms_p}"


@pytest.mark.parametrize("is_pos", [8, 10, 12, 15])
def test_long_block_intensity_extended_positions(is_pos):
    # the spec defines is_pos 0..6, but 4-bit scalefactor fields reach 15
    # and mpg123 continues the tan(is_pos*pi/12) formula — we match
    # (is_pos 9 → tan = −1 → division by zero is ill-defined both ways;
    # mpg123 emits NaN, we emit huge-but-finite)
    rms_o, rms_p = _both_match_mpg123(_long_blob(1, is_pos, right_sc=14))
    assert rms_o < TOL, f"oracle rms {rms_o}"
    assert rms_p < TOL, f"production rms {rms_p}"


def test_long_block_intensity_bound_at_last_nonzero():
    # right channel has decoded-but-zero lines → still intensity-processed;
    # nonzero right content raises the bound past its band
    for rv in (np.zeros(24, np.int32),
               np.asarray([0] * 20 + [1, -1, 1, -1], np.int32)):
        for band in (1, 8):
            rms_o, rms_p = _both_match_mpg123(
                _long_blob(1, 4, band=band, right_vals=rv))
            assert rms_o < TOL and rms_p < TOL, (band, rms_o, rms_p)


def _short_blob(mode_ext, sfr36, left_seg, right_vals=(), right_sc=9):
    sb = T.SFB_SHORT[44100]
    sfb, w = left_seg
    lo, hi = int(sb[sfb]), int(sb[sfb + 1])
    w_ = hi - lo
    a = lo * 3 + w * w_
    vals = np.zeros(a + w_ + ((a + w_) % 2), np.int32)
    vals[a : a + w_] = ([1, -1] * ((w_ + 1) // 2))[:w_]
    return make_l3_frame(
        sr=44100, mode=1, mode_ext=mode_ext,
        spectra=(vals, np.asarray(right_vals, np.int32)),
        scalefac=((), list(sfr36)), scalefac_compress=(0, right_sc),
        global_gain=(240, 210), block_type=(2, 2),
    ) * 12


@pytest.mark.parametrize("mode_ext", [1, 3])
@pytest.mark.parametrize("seg", [(4, 0), (4, 1), (7, 2), (12, 0)])
def test_short_block_intensity_segments(mode_ext, seg):
    sfr = [(s + w) % 4 for s in range(12) for w in range(3)]
    rms_o, rms_p = _both_match_mpg123(_short_blob(mode_ext, sfr, seg))
    assert rms_o < TOL, f"oracle rms {rms_o}"
    assert rms_p < TOL, f"production rms {rms_p}"


def test_short_block_per_window_bound():
    # right content in window 1 through sfb 3: window 1 below-bound stays
    # LR/MS, other windows fully intensity
    sb = T.SFB_SHORT[44100]
    rv = np.zeros(576, np.int32)
    lo, hi = int(sb[3]), int(sb[4])
    w_ = hi - lo
    a = lo * 3 + 1 * w_
    rv[a : a + 4] = [1, -1, 1, -1]
    rv = rv[: a + w_ + ((a + w_) % 2)]
    for mode_ext in (1, 3):
        for seg in [(5, 1), (2, 1), (5, 0), (2, 2)]:
            rms_o, rms_p = _both_match_mpg123(
                _short_blob(mode_ext, [2] * 36, seg, right_vals=rv))
            assert rms_o < TOL and rms_p < TOL, (mode_ext, seg, rms_o, rms_p)
