"""LSF (MPEG-2/2.5) intensity stereo conformance, pinned to mpg123.

No encoder emits LSF intensity stereo, so — like tests/test_intensity.py
for MPEG-1 — these tests craft surgical 22.05 kHz streams with the bit
writer and require both decode paths to match mpg123.  The semantics
they pin (extracted by single-bit → band probing):

  * the intensity channel's scalefactors use the is_pos layout keyed by
    scalefac_compress >> 1 (tables.lsf_scalefac_layout_istereo); bit 0
    of scalefac_compress is intensity_scale;
  * is_pos 0 copies the left spectrum to both channels; odd is_pos
    scales LEFT by io^((is_pos+1)/2), even scales RIGHT by io^(is_pos/2)
    with io = 2^-(intensity_scale+1)/4; is_pos 7 leaves the band
    untouched (or MS when mode_ext & 2);
  * below the intensity bound the same values act as ordinary requant
    scalefactors for the right channel's own spectrum;
  * the bound itself follows the MPEG-1 rule (band past the right
    channel's last nonzero line, per window for short blocks).
"""

import numpy as np
import pytest

from audio_decoder_tpu.codecs.mpeg import decoder as MD
from audio_decoder_tpu.codecs.mpeg import native as NAT
from audio_decoder_tpu.codecs.mpeg import tables as T
from audio_decoder_tpu.io.assets import Asset

from . import codec_refs as CR
from . import mp3_oracle as MO
from .mp3_writer import make_l3_frame

pytestmark = pytest.mark.skipif(
    not CR.have_mpg123(), reason="system mpg123 not available"
)

TOL = 2e-5
SR = 22050
LB = T.SFB_LONG[SR]
SB = T.SFB_SHORT[SR]

#: right-granule kwargs: big_values 288 with table 0 (zero-length codes)
#: makes the count1 region empty, so the declared-length slack bits are
#: inert (mpg123 otherwise decodes trailing zeros as count1 +1-quads,
#: moving the intensity bound)
_EMPTY_RIGHT = dict(
    bv_override=(None, 288), table_select=(1, 0), sf_pad_bits=(0, 9)
)


def _both_match_mpg123(blob: bytes, pyfe: bool = False):
    ref, _ = CR.mpg123_decode(blob)
    mine, _ = MO.decode(blob)
    n = min(len(ref), len(mine))
    scale = max(float(np.abs(ref).max()), 1e-9)
    rms_o = float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean())) / scale
    orig = NAT.available
    if pyfe:
        NAT.available = lambda: False
    try:
        pieces = MD.decode_group(
            [Asset(path="x", name="x", ext="mp3", data=blob)]
        )
    finally:
        NAT.available = orig
    f = pieces[0][1].file(0)
    n2 = min(len(ref), f.pcm.shape[0])
    rms_p = float(np.sqrt(((ref[:n2] - f.pcm[:n2]) ** 2).mean())) / scale
    return rms_o, rms_p


def _long_blob(sfvals, sc, band=5, right_vals=(), mode_ext=1):
    lo, hi = int(LB[band]), int(LB[band + 1])
    vals = np.zeros(hi + (hi % 2), np.int32)
    vals[lo:hi] = ([1, -1] * ((hi - lo + 1) // 2))[: hi - lo]
    kw = _EMPTY_RIGHT if len(right_vals) == 0 else {}
    return make_l3_frame(
        sr=SR, mode=1, mode_ext=mode_ext,
        spectra=(vals, np.asarray(right_vals, np.int32)),
        scalefac=((), list(sfvals)), scalefac_compress=(0, sc),
        global_gain=(240, 210), **kw,
    ) * 10


def _short_blob(sf36, sc, seg=(4, 1), right_vals=(), mode_ext=1):
    sfb, w = seg
    lo, hi = int(SB[sfb]), int(SB[sfb + 1])
    w_ = hi - lo
    a = lo * 3 + w * w_
    vals = np.zeros(a + w_ + ((a + w_) % 2), np.int32)
    vals[a : a + w_] = ([1, -1] * ((w_ + 1) // 2))[:w_]
    kw = _EMPTY_RIGHT if len(right_vals) == 0 else {}
    return make_l3_frame(
        sr=SR, mode=1, mode_ext=mode_ext,
        spectra=(vals, np.asarray(right_vals, np.int32)),
        scalefac=((), list(sf36)), scalefac_compress=(0, sc),
        global_gain=(240, 210), block_type=(2, 2), **kw,
    ) * 10


_SC_SLEN3 = (3 * 36 + 3 * 6 + 3) << 1  # category 1, slen (3,3,3)


@pytest.mark.parametrize("scale", [0, 1])
@pytest.mark.parametrize("is_pos", [0, 1, 2, 3, 7])
def test_lsf_long_value_matrix(scale, is_pos):
    # copy (0), odd → left io^k, even → right io^k, 7 → untouched
    blob = _long_blob([is_pos] * 21, _SC_SLEN3 | scale)
    rms_o, rms_p = _both_match_mpg123(blob)
    assert rms_o < TOL, f"oracle rms {rms_o}"
    assert rms_p < TOL, f"production rms {rms_p}"


def test_lsf_long_is7_ms_fallback():
    blob = _long_blob([7] * 21, _SC_SLEN3 | 1, mode_ext=3)
    rms_o, rms_p = _both_match_mpg123(blob)
    assert rms_o < TOL and rms_p < TOL, (rms_o, rms_p)


@pytest.mark.parametrize(
    "sfvals,sc_key",
    [
        # category 1 (sc' < 180), mixed slens (1,2,3)
        ([1, 2, 3, 0, 1, 2, 3] * 3, 1 * 36 + 2 * 6 + 3),
        # category 2 (180..243), slens (2,1,3)
        ([2, 1, 3, 1] * 6, 180 + 2 * 16 + 1 * 4 + 3),
        # category 3 (244+), slens (3,1)
        ([3, 1] * 11, 244 + 3 * 3 + 1),
    ],
)
@pytest.mark.parametrize("scale", [0, 1])
def test_lsf_layout_categories(sfvals, sc_key, scale):
    blob = _long_blob(sfvals, (sc_key << 1) | scale, band=8)
    rms_o, rms_p = _both_match_mpg123(blob)
    assert rms_o < TOL and rms_p < TOL, (rms_o, rms_p)


def test_lsf_long_bound_and_subbound_gains():
    # right content through band 3: band 8 intensity, band 2 stays LR;
    # the right channel's own lines requantize with the is_pos values
    # acting as normal scalefactor gains
    rv = np.concatenate(
        [np.zeros(int(LB[3]), np.int32), [1, -1, 1, -1]]
    ).astype(np.int32)
    for band in (8, 2):
        blob = _long_blob([1] * 21, (1 * 36 + 1 * 6 + 1) << 1, band=band,
                          right_vals=rv)
        rms_o, rms_p = _both_match_mpg123(blob)
        assert rms_o < TOL and rms_p < TOL, (band, rms_o, rms_p)


@pytest.mark.parametrize("scale", [0, 1])
@pytest.mark.parametrize("seg", [(4, 1), (7, 2), (10, 0)])
def test_lsf_short_segments(scale, seg):
    # short i-layout is 12+12+12 slots, sfb-major window-minor; segments
    # strided in reordered line space like MPEG-1
    sfv = [(s + w) % 4 for s in range(12) for w in range(3)]
    blob = _short_blob(sfv, ((2 * 36 + 2 * 6 + 2) << 1) | scale, seg=seg)
    rms_o, rms_p = _both_match_mpg123(blob)
    assert rms_o < TOL and rms_p < TOL, (seg, rms_o, rms_p)


def test_lsf_short_per_window_bound():
    rv = np.zeros(576, np.int32)
    lo, hi = int(SB[3]), int(SB[4])
    w_ = hi - lo
    a = lo * 3 + 1 * w_
    rv[a : a + 4] = [1, -1, 1, -1]
    rv = rv[: a + w_ + ((a + w_) % 2)]
    for seg in [(5, 1), (2, 1), (5, 0)]:
        blob = _short_blob([2] * 36, ((2 * 36 + 2 * 6 + 2) << 1) | 1,
                           seg=seg, right_vals=rv)
        rms_o, rms_p = _both_match_mpg123(blob)
        assert rms_o < TOL and rms_p < TOL, (seg, rms_o, rms_p)


def test_lsf_intensity_python_frontend():
    # the pure-Python front-end fallback derives the same lane metadata
    blob = _long_blob([1, 2, 3, 0, 1, 2, 3] * 3,
                      ((1 * 36 + 2 * 6 + 3) << 1) | 1, band=8)
    rms_o, rms_p = _both_match_mpg123(blob, pyfe=True)
    assert rms_o < TOL and rms_p < TOL, (rms_o, rms_p)
