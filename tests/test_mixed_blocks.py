"""Mixed-block (block_type 2, mixed_block_flag) conformance vs mpg123.

No mainstream encoder emits mixed blocks, so these streams come from the
bit writer.  They pin: the mixed hybrid (long IMDCT windows on subbands
0-1, short above), the mixed scalefactor layouts (MPEG-1 8+27 and LSF
normal/is_pos kinds), and mixed-block intensity stereo — the long region
(lines < 36) follows the long-band rule with the GLOBAL last-nonzero
bound (any short-region right content pushes it past the whole long
part), the short region keeps the per-window rule over sfb >= 3.  Also
the band-0 bound edge: a fully empty right channel puts band 0 inside
the intensity region (both families, long and short blocks).
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

TOL = 2e-5

#: right granule encodes 288 big-value pairs with table 0 (zero-length
#: codes): an actually-empty spectrum whose count1 region can't swallow
#: slack bits (see test_intensity_lsf.py)
_EMPTY_RIGHT = dict(
    bv_override=(None, 288), table_select=(1, 0), sf_pad_bits=(0, 9)
)


def _both_match_mpg123(blob: bytes):
    ref, _ = CR.mpg123_decode(blob)
    mine, _ = MO.decode(blob)
    n = min(len(ref), len(mine))
    scale = max(float(np.abs(ref).max()), 1e-9)
    rms_o = float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean())) / scale
    pieces = MD.decode_group(
        [Asset(path="x", name="x", ext="mp3", data=blob)]
    )
    f = pieces[0][1].file(0)
    n2 = min(len(ref), f.pcm.shape[0])
    rms_p = float(np.sqrt(((ref[:n2] - f.pcm[:n2]) ** 2).mean())) / scale
    return rms_o, rms_p


def _content(sr: int, region: str) -> np.ndarray:
    """Left-channel lines: long region (0..36) and/or one short segment."""
    sb = T.SFB_SHORT[sr]
    lo, hi = int(sb[4]), int(sb[5])
    w_ = hi - lo
    a = lo * 3 + 1 * w_
    n = 36 if region == "long" else a + w_ + ((a + w_) % 2)
    vals = np.zeros(n, np.int32)
    if region in ("long", "both"):
        vals[:12] = [1, -1] * 6  # long bands 0..1-2, incl. band 0
    if region in ("short", "both"):
        vals[a : a + w_] = ([1, -1] * ((w_ + 1) // 2))[:w_]
    return vals


def _mixed_blob(sr, sfvals, sc_r, region="both", mode_ext=1, right_vals=()):
    kw = dict(
        sr=sr, mode=1, mode_ext=mode_ext,
        spectra=(_content(sr, region), np.asarray(right_vals, np.int32)),
        scalefac=((), list(sfvals)), scalefac_compress=(0, sc_r),
        block_type=(2, 2), global_gain=(240, 210), mixed=(1, 1),
    )
    if len(right_vals) == 0:
        kw.update(_EMPTY_RIGHT)
    return make_l3_frame(**kw) * 10


def test_mixed_blocks_decode_mono_and_stereo():
    # the mixed hybrid itself (windows/antialias/reorder/scalefactors)
    for sr in (44100, 22050):
        vals = _content(sr, "both")
        for mode, spectra, nch in ((3, (vals,), 1), (0, (vals, vals), 2)):
            blob = make_l3_frame(
                sr=sr, mode=mode, mode_ext=0, spectra=spectra,
                scalefac=((),) * nch, scalefac_compress=(0,) * nch,
                block_type=(2,) * nch, global_gain=(240, 235)[:nch],
                mixed=(1,) * nch,
            ) * 10
            rms_o, rms_p = _both_match_mpg123(blob)
            assert rms_o < TOL and rms_p < TOL, (sr, mode, rms_o, rms_p)


@pytest.mark.parametrize("region", ["long", "short", "both"])
@pytest.mark.parametrize("is_pos", [0, 2, 4])
def test_mixed_intensity_mpeg1(region, is_pos):
    for mode_ext in (1, 3):
        blob = _mixed_blob(44100, [is_pos] * 35, 4, region, mode_ext)
        rms_o, rms_p = _both_match_mpg123(blob)
        assert rms_o < TOL and rms_p < TOL, (region, is_pos, rms_o, rms_p)


def test_mixed_intensity_mpeg1_varied_slots():
    blob = _mixed_blob(44100, [(i % 5) for i in range(35)], 4)
    rms_o, rms_p = _both_match_mpg123(blob)
    assert rms_o < TOL and rms_p < TOL, (rms_o, rms_p)


@pytest.mark.parametrize("region", ["long", "short", "both"])
@pytest.mark.parametrize("scale", [0, 1])
def test_mixed_intensity_lsf(region, scale):
    blob = _mixed_blob(22050, [1] * 33, (43 << 1) | scale, region)
    rms_o, rms_p = _both_match_mpg123(blob)
    assert rms_o < TOL and rms_p < TOL, (region, scale, rms_o, rms_p)


def test_mixed_intensity_bound_interactions():
    sb = T.SFB_SHORT[44100]
    # right content in the SHORT region → whole long part below bound
    lo, hi = int(sb[5]), int(sb[6])
    w_ = hi - lo
    n = lo * 3 + w_ + 4
    n += n % 2
    rv = np.zeros(n, np.int32)
    rv[lo * 3 + w_ : lo * 3 + w_ + 4] = [1, -1, 1, -1]
    rms_o, rms_p = _both_match_mpg123(
        _mixed_blob(44100, [2] * 35, 4, right_vals=rv))
    assert rms_o < TOL and rms_p < TOL, (rms_o, rms_p)
    # right content in LONG band 2 → long bands above 2 intensity,
    # below LR; short part unaffected
    rv2 = np.zeros(12, np.int32)
    rv2[8:12] = [1, -1, 1, -1]
    rms_o, rms_p = _both_match_mpg123(
        _mixed_blob(44100, [2] * 35, 4, right_vals=rv2))
    assert rms_o < TOL and rms_p < TOL, (rms_o, rms_p)


def test_intensity_band0_with_empty_right():
    # rzero == 0 puts band 0 INSIDE the intensity region (mpg123 parity);
    # non-mixed long and short blocks, both families
    for sr, sc, nsf in ((44100, 4, 21), (22050, 86, 21)):
        lb = T.SFB_LONG[sr]
        hi = int(lb[1])
        vals = np.zeros(hi + (hi % 2), np.int32)
        vals[:hi] = ([1, -1] * ((hi + 1) // 2))[:hi]
        blob = make_l3_frame(
            sr=sr, mode=1, mode_ext=1, spectra=(vals, ()),
            scalefac=((), [4 if nsf == 21 and sc == 4 else 1] * nsf),
            scalefac_compress=(0, sc), global_gain=(240, 210),
            **_EMPTY_RIGHT,
        ) * 10
        rms_o, rms_p = _both_match_mpg123(blob)
        assert rms_o < TOL and rms_p < TOL, (sr, rms_o, rms_p)
    for sr, sc in ((44100, 4), (22050, 86)):
        sb = T.SFB_SHORT[sr]
        w_ = int(sb[1]) - int(sb[0])
        vals = np.zeros(w_ + (w_ % 2), np.int32)
        vals[:w_] = ([1, -1] * ((w_ + 1) // 2))[:w_]
        blob = make_l3_frame(
            sr=sr, mode=1, mode_ext=1, spectra=(vals, ()),
            scalefac=((), [1] * 36), scalefac_compress=(0, sc),
            global_gain=(240, 210), block_type=(2, 2), **_EMPTY_RIGHT,
        ) * 10
        rms_o, rms_p = _both_match_mpg123(blob)
        assert rms_o < TOL and rms_p < TOL, (sr, rms_o, rms_p)


def test_mixed_intensity_8k_gap_region():
    # at 8 kHz the mixed long/short boundary is line 72 (3*short[3]), not
    # 36: content in lines 36..72 is LONG bands 3-5 and must use the
    # long-band rule (the device path once hard-coded 36)
    vals = np.zeros(72, np.int32)
    vals[40:60] = [1, -1] * 10
    for sc in (86, 87):
        blob = make_l3_frame(
            sr=8000, mode=1, mode_ext=1, spectra=(vals, ()),
            scalefac=((), [1] * 33), scalefac_compress=(0, sc),
            block_type=(2, 2), global_gain=(240, 210), mixed=(1, 1),
            **_EMPTY_RIGHT,
        ) * 10
        rms_o, rms_p = _both_match_mpg123(blob)
        assert rms_o < TOL and rms_p < TOL, (sc, rms_o, rms_p)
