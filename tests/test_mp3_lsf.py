"""MPEG-2 / MPEG-2.5 (LSF) Layer III decode across all nine sample rates.

The reference's mpeg.rs header tables enumerate the LSF versions but never
decode them (its decode is a TODO); here the oracle, both host front-ends,
and the fused on-device path all handle MPEG-1/-2/-2.5 and are pinned to
mpg123 (the oracle) / the oracle (production paths) at float32 roundoff.
"""

import numpy as np
import pytest

from audio_decoder_tpu.codecs.mpeg import decoder as MD
from audio_decoder_tpu.codecs.mpeg import frontend as FE
from audio_decoder_tpu.codecs.mpeg import native as NA
from audio_decoder_tpu.io.assets import Asset

from . import codec_refs as CR
from . import mp3_oracle as MO

pytestmark = pytest.mark.skipif(
    not (CR.have_lame() and CR.have_mpg123()),
    reason="system lame/mpg123 not available",
)

TOL = 5e-7

#: (sample_rate, bitrate, lame mode) per MPEG version family
LSF_CASES = [
    (22050, 64, 1), (24000, 64, 0), (16000, 48, 0),   # MPEG-2
    (11025, 32, 1), (12000, 40, 1), (8000, 24, 1),    # MPEG-2.5
]


def _blob(sr: int, br: int, mode, seconds: float = 1.0) -> bytes:
    rng = np.random.default_rng(sr)
    n = int(sr * seconds)
    t = np.arange(n)
    s = 0.25 * np.sin(2 * np.pi * 880 * t / sr)
    s[::2000] = 0.9  # transients force short blocks / window switching
    s = s + 0.1 * rng.standard_normal(n)
    pcm = np.clip(np.stack([s, np.roll(s, 7) * 0.8], 1) * 30000,
                  -32768, 32767).astype(np.int16)
    return CR.lame_encode(pcm, sr, br, mode=mode)


@pytest.mark.parametrize("sr,br,mode", LSF_CASES)
def test_lsf_oracle_matches_mpg123(sr, br, mode):
    blob = _blob(sr, br, mode)
    ref, rsr = CR.mpg123_decode(blob)
    mine, msr = MO.decode(blob)
    assert rsr == msr == sr
    n = min(len(ref), len(mine))
    assert n > sr // 4
    rms = float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean()))
    assert rms < TOL, f"rms {rms}"


@pytest.mark.parametrize("sr,br,mode", LSF_CASES)
def test_lsf_fused_production_path(sr, br, mode):
    blob = _blob(sr, br, mode)
    ref, _ = MO.decode(blob)
    pieces = MD.decode_group([Asset(path="x", name="x", ext="mp3", data=blob)])
    f = pieces[0][1].file(0)
    assert f.err == 0 and f.sample_rate == sr
    n = min(len(ref), f.pcm.shape[0])
    rms = float(np.sqrt(((ref[:n, : f.num_channels] - f.pcm[:n]) ** 2).mean()))
    assert rms < TOL, f"rms {rms}"


@pytest.mark.skipif(not NA.available(), reason="toolchain unavailable")
@pytest.mark.parametrize("sr,br,mode", LSF_CASES[:3])
def test_lsf_native_lanes_bitexact(sr, br, mode):
    blob = _blob(sr, br, mode)
    ln = FE.analyze_lanes(blob)
    M = (len(ln.main_data) + 3) // 4 * 4
    r = NA.lanes_batch([blob], ln.n_granules, M, ln.channels)
    np.testing.assert_array_equal(r["start"][0], ln.start_bit)
    np.testing.assert_array_equal(r["end"][0], ln.end_bit)
    np.testing.assert_array_equal(r["exp_b"][0], ln.exp_b)
    np.testing.assert_array_equal(r["r1"][0], ln.region1)
    np.testing.assert_array_equal(r["cfg"][0], ln.blockcfg)
    np.testing.assert_array_equal(r["valid"][0], ln.valid)
    np.testing.assert_array_equal(r["sfr"][0], ln.sfr_bands)
    np.testing.assert_array_equal(
        r["main"][0][: len(ln.main_data)], ln.main_data)


def test_all_nine_rates_one_mixed_batch():
    """Every MPEG version family decodes together through decode_group."""
    cases = [(44100, 128, 1), (48000, 320, 0), (32000, 64, 1)] + LSF_CASES
    blobs = [(sr, _blob(sr, br, mode, 0.5)) for sr, br, mode in cases]
    assets = [Asset(path=f"f{i}", name=f"f{i}", ext="mp3", data=b)
              for i, (_sr, b) in enumerate(blobs)]
    pieces = MD.decode_group(assets)
    got = {}
    for idxs, batch in pieces:
        for row, i in enumerate(idxs):
            got[i] = batch.file(row)
    for i, (sr, blob) in enumerate(blobs):
        f = got[i]
        assert f.err == 0 and f.sample_rate == sr
        ref, _ = MO.decode(blob)
        n = min(len(ref), f.pcm.shape[0])
        rms = float(np.sqrt(((ref[:n, : f.num_channels] - f.pcm[:n]) ** 2).mean()))
        assert rms < TOL, f"sr={sr}: rms {rms}"
