"""Encode surface: WAV/AIFF/AU writers round-trip through BOTH readers.

The reference is decode-only; the export half is a beyond-reference
addition (io/encode.py).  Contract pinned here:

  * integer PCM round-trips BIT-EXACTLY: decode(encode(x)) == x when x
    is a multiple of 1/2^(bits-1) (the device pack op is the exact
    inverse of ops.unpack's scale convention);
  * the containers are readable by the independent NumPy oracle
    (tests/oracle.py), not just by our own device parsers;
  * the IEEE-80 AIFF rate field encodes integer rates exactly
    (inverse of aiff.rs:51-94 semantics);
  * out-of-range samples clip (never wrap);
  * the transcode CLI joins decode → resample → encode end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from audio_decoder_tpu.codecs.registry import decode_assets
from audio_decoder_tpu.io.assets import Asset
from audio_decoder_tpu.io.encode import (
    encode_aiff, encode_au, encode_wav, write_audio,
)

from . import oracle


def _decode_one(data: bytes, ext: str):
    batch = decode_assets(
        [Asset(path=f"a.{ext}", name="a", ext=ext, data=data)])
    return batch.file(0)


def _grid_pcm(rng, bits: int, frames: int = 311, ch: int = 2) -> np.ndarray:
    """Random PCM exactly on the bits-bit grid (and f32-representable:
    32-bit values keep 24 significant bits, the f32 significand)."""
    hi = 1 << (bits - 1)
    ints = rng.integers(-hi, hi, size=(frames, ch))
    if bits == 32:
        ints &= ~0xFF  # low byte zero → exactly representable in f32
    return (ints.astype(np.float64) / hi).astype(np.float32)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_wav_round_trip_bit_exact(rng, bits):
    pcm = _grid_pcm(rng, bits)
    blob = encode_wav(pcm, 44100, bits=bits)
    f = _decode_one(blob, "wav")
    assert f.err == 0
    assert (f.sample_rate, f.num_channels, f.bits_per_sample) == (44100, 2, bits)
    np.testing.assert_array_equal(f.pcm, pcm)
    ref = oracle.parse_wav(blob)  # independent reader
    assert ref["sample_rate"] == 44100 and ref["bits"] == bits
    np.testing.assert_array_equal(ref["pcm"].astype(np.float32), pcm)


def test_wav_float32_round_trip(rng):
    pcm = rng.standard_normal((257, 2)).astype(np.float32) * 0.7
    blob = encode_wav(pcm, 48000, bits=32, float_=True)
    f = _decode_one(blob, "wav")
    assert f.err == 0
    np.testing.assert_array_equal(f.pcm, pcm)
    np.testing.assert_array_equal(
        oracle.parse_wav(blob)["pcm"].astype(np.float32), pcm)


@pytest.mark.parametrize("bits", [8, 16, 24])
@pytest.mark.parametrize("rate", [8000, 11025, 22050, 44100, 96000])
def test_aiff_round_trip_bit_exact(rng, bits, rate):
    pcm = _grid_pcm(rng, bits, frames=127, ch=1)
    blob = encode_aiff(pcm, rate, bits=bits)
    f = _decode_one(blob, "aif")
    assert f.err == 0
    assert (f.sample_rate, f.num_channels) == (rate, 1)  # IEEE-80 exact
    np.testing.assert_array_equal(f.pcm, pcm)
    ref = oracle.parse_aiff(blob)
    assert ref["sample_rate"] == rate
    np.testing.assert_array_equal(ref["pcm"].astype(np.float32), pcm)


@pytest.mark.parametrize("bits,float_", [(16, False), (24, False), (32, True)])
def test_au_round_trip(rng, bits, float_):
    pcm = (rng.standard_normal((200, 2)).astype(np.float32) * 0.5
           if float_ else _grid_pcm(rng, bits, frames=200))
    blob = encode_au(pcm, 32000, bits=bits, float_=float_)
    f = _decode_one(blob, "au")
    assert f.err == 0
    assert (f.sample_rate, f.num_channels) == (32000, 2)
    np.testing.assert_array_equal(f.pcm, pcm)


def test_encode_clips_never_wraps():
    pcm = np.asarray([[1.5], [-1.5], [1.0], [-1.0]], np.float32)
    blob = encode_wav(pcm, 44100, bits=16)
    got = oracle.parse_wav(blob)["pcm"][:, 0]
    assert got[0] == pytest.approx(32767 / 32768)
    assert got[1] == -1.0 and got[2] == pytest.approx(32767 / 32768)
    assert got[3] == -1.0
    # 32-bit int: clip must hold through the f32 rounding at 2^31
    blob32 = encode_wav(pcm, 44100, bits=32)
    got32 = oracle.parse_wav(blob32)["pcm"][:, 0]
    assert np.all(got32[[0, 2]] > 0.99) and np.all(got32[[1, 3]] == -1.0)


def test_odd_payloads_stay_aligned(rng):
    # odd byte counts exercise the RIFF pad byte and AIFF SSND pad
    pcm = _grid_pcm(rng, 8, frames=333, ch=1)
    f = _decode_one(encode_wav(pcm, 22050, bits=8), "wav")
    assert f.err == 0 and f.pcm.shape[0] == 333
    np.testing.assert_array_equal(f.pcm, pcm)
    pcm24 = _grid_pcm(rng, 24, frames=111, ch=1)
    f = _decode_one(encode_aiff(pcm24, 22050, bits=24), "aif")
    assert f.err == 0
    np.testing.assert_array_equal(f.pcm, pcm24)


def test_write_audio_dispatch(tmp_path, rng):
    pcm = _grid_pcm(rng, 16, frames=64)
    for name in ("x.wav", "x.aiff", "x.au"):
        write_audio(str(tmp_path / name), pcm, 44100, bits=16)
        assert (tmp_path / name).stat().st_size > 64 * 2 * 2
    with pytest.raises(ValueError, match="no encoder"):
        write_audio(str(tmp_path / "x.mp3"), pcm, 44100)
    with pytest.raises(ValueError, match="float AIFF"):
        write_audio(str(tmp_path / "y.aif"), pcm, 44100, bits=32, float_=True)


@pytest.mark.parametrize("bits,float_,little", [
    (16, False, False), (24, False, True), (32, True, False),
])
def test_caf_round_trip(rng, bits, float_, little):
    from audio_decoder_tpu.io.encode import encode_caf

    pcm = (rng.standard_normal((180, 2)).astype(np.float32) * 0.5
           if float_ else _grid_pcm(rng, bits, frames=180))
    blob = encode_caf(pcm, 48000, bits=bits, float_=float_, little=little)
    f = _decode_one(blob, "caf")
    assert f.err == 0
    assert (f.sample_rate, f.num_channels) == (48000, 2)
    np.testing.assert_array_equal(f.pcm, pcm)


@pytest.mark.parametrize("bits", [16, 24])
def test_rf64_round_trip(rng, bits):
    # RF64 form at small size: sizes live in ds64, sentinels in riff/data
    pcm = _grid_pcm(rng, bits, frames=271)
    blob = encode_wav(pcm, 44100, bits=bits, rf64=True)
    assert blob[:4] == b"RF64" and blob[4:8] == b"\xff\xff\xff\xff"
    f = _decode_one(blob, "wav")
    assert f.err == 0
    assert (f.sample_rate, f.num_channels) == (44100, 2)
    assert f.pcm.shape[0] == 271
    np.testing.assert_array_equal(f.pcm, pcm)


def test_tpdf_dither(rng):
    # dither perturbs the quantizer by at most ±1 LSB, is reproducible
    # for a given seed, and differs across seeds
    pcm = (rng.standard_normal((4096, 1)).astype(np.float32) * 1e-3)
    plain = oracle.parse_wav(encode_wav(pcm, 44100, bits=16))["pcm"]
    d1 = oracle.parse_wav(encode_wav(pcm, 44100, bits=16, dither=1))["pcm"]
    d1b = oracle.parse_wav(encode_wav(pcm, 44100, bits=16, dither=1))["pcm"]
    d2 = oracle.parse_wav(encode_wav(pcm, 44100, bits=16, dither=2))["pcm"]
    np.testing.assert_array_equal(d1, d1b)
    assert not np.array_equal(d1, d2) and not np.array_equal(d1, plain)
    lsb = 1.0 / 32768
    assert np.abs(d1 - plain).max() <= lsb + 1e-9
    # TPDF decorrelates the error from the signal: quantization of a
    # low-level ramp is staircase-free on average — mean error near 0
    ramp = np.linspace(0, 4e-4, 8192, dtype=np.float32)[:, None]
    dd = oracle.parse_wav(encode_wav(ramp, 44100, bits=16, dither=3))["pcm"]
    assert abs(float((dd - ramp).mean())) < lsb / 16


def test_export_batch_inverse_of_decode_dir(tmp_path, rng):
    import audio_decoder_tpu as adt

    src = tmp_path / "assets"
    src.mkdir()
    a = _grid_pcm(rng, 16, frames=300, ch=2)
    b = _grid_pcm(rng, 16, frames=150, ch=1)
    write_audio(str(src / "a.wav"), a, 44100, bits=16)
    write_audio(str(src / "b.aiff"), b, 22050, bits=16)
    (src / "junk.wav").write_bytes(b"RIFFnope")  # errored file skipped
    batch, names = adt.decode_dir(str(src))
    out = tmp_path / "out"
    written = adt.export_batch(str(out), batch, names, container="aiff")
    assert set(written) == {"a", "b"}
    fa = _decode_one((out / "a.aiff").read_bytes(), "aif")
    fb = _decode_one((out / "b.aiff").read_bytes(), "aif")
    assert (fa.sample_rate, fb.sample_rate) == (44100, 22050)
    np.testing.assert_array_equal(fa.pcm, a)
    np.testing.assert_array_equal(fb.pcm, b)


def test_transcode_cli(tmp_path, rng):
    from audio_decoder_tpu.cli import main

    pcm = _grid_pcm(rng, 16, frames=500)
    src = tmp_path / "in.wav"
    write_audio(str(src), pcm, 44100, bits=16)
    out = tmp_path / "out.aiff"
    assert main(["transcode", str(src), str(out)]) == 0
    f = _decode_one(out.read_bytes(), "aif")
    assert f.err == 0
    np.testing.assert_array_equal(f.pcm, pcm)
    # resampling transcode: 44.1k → 22.05k halves the length (±1 frame)
    out2 = tmp_path / "half.wav"
    assert main(["transcode", str(src), str(out2), "--rate", "22050"]) == 0
    g = _decode_one(out2.read_bytes(), "wav")
    assert g.err == 0 and g.sample_rate == 22050
    assert abs(g.pcm.shape[0] - 250) <= 2
    # --float into a container with no float form (FLAC is integer-only
    # by spec): clean one-line error + nonzero exit, not a TypeError
    assert main(["transcode", str(src), str(tmp_path / "x.flac"),
                 "--float"]) == 1
    assert not (tmp_path / "x.flac").exists()


def test_export_cli(tmp_path, rng):
    """export = decode_dir → export_batch: mixed container inputs come
    out as one container; undecodable files are skipped, not fatal."""
    from audio_decoder_tpu.cli import main
    from audio_decoder_tpu.codecs.registry import decode_paths

    a = _grid_pcm(rng, 16, frames=500)
    b = _grid_pcm(rng, 16, frames=300)
    d = tmp_path / "assets"
    d.mkdir()
    write_audio(str(d / "a.wav"), a, 44100, bits=16)
    write_audio(str(d / "b.aiff"), b, 48000, bits=16)
    (d / "junk.wav").write_bytes(b"not audio at all")
    out = tmp_path / "out"
    assert main(["export", "--assets", str(d), "--out", str(out),
                 "--container", "flac"]) == 0
    got = decode_paths([str(out / "a.flac"), str(out / "b.flac")])
    assert np.asarray(got.err).sum() == 0
    assert int(got.sample_rate[1]) == 48000  # per-file rates kept
    np.testing.assert_array_equal(np.asarray(got.file(0).pcm), a)
    np.testing.assert_array_equal(np.asarray(got.file(1).pcm), b)
    assert not (out / "junk.flac").exists()
