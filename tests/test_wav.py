"""WAV decode: bit-exactness vs the NumPy oracle + error taxonomy.

Covers the reference surface (blast/src/file_parsing/wav.rs) plus the
intended-semantics upgrades: all bit depths, extensible headers, unknown
chunks, truncation → UnexpectedEof.
"""

import numpy as np
import pytest

import audio_decoder_tpu as adt
from audio_decoder_tpu.core import errors as E
from audio_decoder_tpu.io.assets import Asset

from . import oracle, synth


def _asset(name: str, data: bytes, ext: str = "wav") -> Asset:
    return Asset(path=f"assets/{name}.{ext}", name=name, ext=ext, data=data)


def _decode_one(blob: bytes, ext: str = "wav"):
    batch = adt.decode_assets([_asset("t", blob, ext)])
    return batch.file(0)


def _random_i16(rng, frames, channels):
    return rng.integers(-32768, 32768, size=(frames, channels)).astype(np.int64)


def test_wav16_bit_exact(rng):
    pcm = _random_i16(rng, 4410, 2)
    blob = synth.make_wav(pcm, 44100, 16)
    got = _decode_one(blob)
    ref = oracle.parse_wav(blob)
    assert got.err == E.ERR_OK
    assert got.sample_rate == 44100
    assert got.num_channels == 2
    assert got.bits_per_sample == 16
    assert got.pcm.shape == ref["pcm"].shape
    np.testing.assert_array_equal(got.pcm, ref["pcm"])  # bit-exact
    np.testing.assert_array_equal(got.pcm, pcm.astype(np.float32) / 32768.0)


@pytest.mark.parametrize("bits", [8, 24, 32])
def test_wav_other_depths_bit_exact(rng, bits):
    hi = 1 << (bits - 1)
    pcm = rng.integers(-hi, hi, size=(1000, 2)).astype(np.int64)
    blob = synth.make_wav(pcm, 22050, bits)
    got = _decode_one(blob)
    ref = oracle.parse_wav(blob)
    assert got.err == E.ERR_OK
    assert got.bits_per_sample == bits
    np.testing.assert_array_equal(got.pcm, ref["pcm"])


def test_wav_float32(rng):
    pcm = rng.standard_normal((777, 1)).astype(np.float32)
    blob = synth.make_wav(pcm, 48000, 32, float32=True)
    got = _decode_one(blob)
    ref = oracle.parse_wav(blob)
    assert got.err == E.ERR_OK
    np.testing.assert_array_equal(got.pcm, ref["pcm"])
    np.testing.assert_array_equal(got.pcm, pcm)


def test_wav_float64(rng):
    """IEEE float64 WAV (fmt 3, 64-bit) demotes to f32 with round-to-
    nearest-even — exactly np.float32(f64) for normal audio values."""
    pcm64 = rng.standard_normal((513, 2)).astype(np.float64) * 0.7
    # include values that exercise mantissa rounding and signed zeros
    pcm64[0, 0] = 0.0
    pcm64[1, 0] = -0.0
    pcm64[2, 0] = 1.0 / 3.0
    # gradual underflow: values inside/around the f32-subnormal range
    # must demote subnormally (not flush), incl. round-to-FLT_MIN
    pcm64[3, 0] = 1e-40
    pcm64[4, 0] = -3.7e-42
    pcm64[5, 0] = float(np.finfo(np.float32).smallest_subnormal) / 2  # half-ULP tie → even → 0
    pcm64[6, 0] = float(np.finfo(np.float32).smallest_subnormal) * 0.75
    pcm64[7, 0] = float(np.finfo(np.float32).tiny) * (1 - 2**-25)  # rounds up to FLT_MIN
    pcm64[8, 0] = 1e-320  # f64 subnormal → 0
    pcm64[9, 0] = float(np.finfo(np.float32).max) * 1.01  # overflow → inf
    pcm64[10, 0] = -np.inf
    pcm64[11, 0] = np.nan
    # NaN whose payload lives only in the low 29 mantissa bits: must stay
    # NaN after demotion (the quiet bit is forced), not become inf
    lownan = np.frombuffer(
        np.uint64(0x7FF0_0000_0000_0001).tobytes(), np.float64)[0]
    pcm64[12, 0] = lownan
    blob = synth.make_wav(pcm64, 44100, 64, float64=True)
    got = _decode_one(blob)
    ref = oracle.parse_wav(blob)
    assert got.err == E.ERR_OK
    assert got.bits_per_sample == 64
    np.testing.assert_array_equal(got.pcm, ref["pcm"])
    np.testing.assert_array_equal(got.pcm, pcm64.astype(np.float32))


def test_wav_extensible_header(rng):
    pcm = _random_i16(rng, 333, 2)
    blob = synth.make_wav(pcm, 44100, 16, extensible=True)
    got = _decode_one(blob)
    ref = oracle.parse_wav(blob)
    assert got.err == E.ERR_OK
    np.testing.assert_array_equal(got.pcm, ref["pcm"])


def test_wav_skips_unknown_chunks(rng):
    pcm = _random_i16(rng, 100, 1)
    extras = [(b"LIST", b"INFOxxxx"), (b"fact", b"\x64\x00\x00\x00"),
              (b"odd ", b"\x01\x02\x03")]  # odd size exercises pad byte
    blob = synth.make_wav(pcm, 8000, 16, extra_chunks=extras)
    got = _decode_one(blob)
    ref = oracle.parse_wav(blob)
    assert got.err == E.ERR_OK
    np.testing.assert_array_equal(got.pcm, ref["pcm"])


def test_wav_odd_data_offset(rng):
    """A 3-byte unknown chunk leaves the data chunk at an odd-ish offset;
    the gather-based unpack must not assume alignment."""
    pcm = _random_i16(rng, 64, 2)
    blob = synth.make_wav(pcm, 44100, 16, extra_chunks=[(b"junk", b"abcde")])
    got = _decode_one(blob)
    np.testing.assert_array_equal(got.pcm, pcm.astype(np.float32) / 32768.0)


def test_wav_truncated_data_is_eof(rng):
    pcm = _random_i16(rng, 100, 2)
    blob = synth.make_wav(pcm, 44100, 16)
    got = _decode_one(blob[:-50])
    assert got.err == E.ERR_EOF
    with pytest.raises(oracle.OracleError) as ei:
        oracle.parse_wav(blob[:-50])
    assert ei.value.kind == "UnexpectedEof"


def test_wav_bad_magic_unsupported(rng):
    pcm = _random_i16(rng, 10, 1)
    blob = b"JUNK" + synth.make_wav(pcm)[4:]
    got = _decode_one(blob)
    assert got.err == E.ERR_UNSUPPORTED


def test_wav_missing_data_chunk_is_eof(rng):
    pcm = _random_i16(rng, 10, 1)
    full = synth.make_wav(pcm, 44100, 16)
    # chop off the data chunk entirely (keep RIFF+fmt only)
    blob = full[: 12 + 8 + 16]
    got = _decode_one(blob)
    assert got.err == E.ERR_EOF


def test_wav_alaw_unsupported(rng):
    """A-law is enumerated but not decodable (≙ wav.rs:9-15 + SURVEY §5.6:
    the reference would silently mis-decode; we reject)."""
    import struct

    pcm = _random_i16(rng, 10, 1)
    blob = synth.make_wav(pcm, 8000, 16)
    # patch fmt code to 6 (A-law)
    blob = blob[:20] + struct.pack("<H", 6) + blob[22:]
    got = _decode_one(blob)
    assert got.err == E.ERR_UNSUPPORTED


def test_mixed_batch_order_and_grouping(rng):
    """Files of different shapes/depths decode in one call; results come back
    in asset order with per-file metadata."""
    a16 = _random_i16(rng, 500, 2)
    b8 = rng.integers(-128, 128, size=(123, 1)).astype(np.int64)
    c24 = rng.integers(-(1 << 23), 1 << 23, size=(77, 2)).astype(np.int64)
    assets = [
        _asset("a", synth.make_wav(a16, 44100, 16)),
        _asset("broken", b"not a wav at all"),
        _asset("b", synth.make_wav(b8, 8000, 8)),
        _asset("c", synth.make_wav(c24, 48000, 24)),
    ]
    batch = adt.decode_assets(assets)
    assert batch.names == ("a", "broken", "b", "c")
    assert batch.batch_size == 4
    f = batch.file(0)
    np.testing.assert_array_equal(f.pcm, a16.astype(np.float32) / 32768.0)
    assert int(batch.err[1]) == E.ERR_UNSUPPORTED
    f = batch.file(2)
    np.testing.assert_array_equal(f.pcm, b8.astype(np.float32) / 128.0)
    assert f.sample_rate == 8000
    f = batch.file(3)
    np.testing.assert_array_equal(
        f.pcm, c24.astype(np.float32) / float(1 << 23)
    )


def test_interleaved_i16_roundtrip(rng):
    """AudioFileView.interleaved_i16 reproduces the reference's Vec<i16>
    layout (decode_helpers.rs:24)."""
    pcm = _random_i16(rng, 50, 2)
    got = _decode_one(synth.make_wav(pcm, 44100, 16))
    np.testing.assert_array_equal(got.interleaved_i16, pcm.reshape(-1))


def test_decode_dir_duplicate_names(tmp_path, rng):
    pcm = _random_i16(rng, 10, 1)
    (tmp_path / "x.wav").write_bytes(synth.make_wav(pcm))
    (tmp_path / "x.aif").write_bytes(synth.make_wav(pcm))  # dup stem, skipped
    (tmp_path / "y.wav").write_bytes(synth.make_wav(pcm))
    batch, names = adt.decode_dir(str(tmp_path))
    assert batch.batch_size == 2
    assert set(names) == {"x", "y"}
