"""AIFF decode: bit-exactness vs the NumPy oracle + error taxonomy.

Covers the reference surface (blast/src/file_parsing/aiff.rs) plus the
8/24/32-bit unpacking the reference lacked (SURVEY §5 defect 6) and the
IEEE-80 sample-rate decode (aiff.rs:51-94).
"""

import numpy as np
import pytest

import audio_decoder_tpu as adt
from audio_decoder_tpu.core import errors as E
from audio_decoder_tpu.io.assets import Asset

from . import oracle, synth


def _decode_one(blob: bytes, ext: str = "aif"):
    batch = adt.decode_assets([Asset(f"assets/t.{ext}", "t", ext, blob)])
    return batch.file(0)


def test_aiff16_bit_exact(rng):
    pcm = rng.integers(-32768, 32768, size=(2205, 2)).astype(np.int64)
    blob = synth.make_aiff(pcm, 44100, 16)
    got = _decode_one(blob)
    ref = oracle.parse_aiff(blob)
    assert got.err == E.ERR_OK
    assert got.sample_rate == 44100
    assert got.num_channels == 2
    assert got.bits_per_sample == 16
    np.testing.assert_array_equal(got.pcm, ref["pcm"])
    np.testing.assert_array_equal(got.pcm, pcm.astype(np.float32) / 32768.0)


@pytest.mark.parametrize("bits", [8, 24, 32])
def test_aiff_other_depths_bit_exact(rng, bits):
    hi = 1 << (bits - 1)
    pcm = rng.integers(-hi, hi, size=(500, 2)).astype(np.int64)
    blob = synth.make_aiff(pcm, 22050, bits)
    got = _decode_one(blob)
    ref = oracle.parse_aiff(blob)
    assert got.err == E.ERR_OK
    np.testing.assert_array_equal(got.pcm, ref["pcm"])


@pytest.mark.parametrize("rate", [8000, 11025, 22050, 44100, 48000, 96000])
def test_aiff_ieee80_rates(rng, rate):
    """IEEE 754 80-bit extended-float sample-rate decode (aiff.rs:51-94)."""
    pcm = rng.integers(-100, 100, size=(16, 1)).astype(np.int64)
    got = _decode_one(synth.make_aiff(pcm, rate, 16))
    assert got.sample_rate == rate


def test_aiff_ssnd_offset(rng):
    """SSND offset field shifts the sample data start (aiff.rs:150-151)."""
    pcm = rng.integers(-32768, 32768, size=(64, 2)).astype(np.int64)
    blob = synth.make_aiff(pcm, 44100, 16, ssnd_offset=16)
    got = _decode_one(blob)
    ref = oracle.parse_aiff(blob)
    assert got.err == E.ERR_OK
    np.testing.assert_array_equal(got.pcm, ref["pcm"])
    np.testing.assert_array_equal(got.pcm, pcm.astype(np.float32) / 32768.0)


def test_aifc_float_compression(rng):
    """AIFC fl32/FL32/fl64/FL64: big-endian IEEE float sample data; fl64
    demotes to f32 exactly like np.float32(f64)."""
    pcm = (rng.standard_normal((513, 2)) * 0.7).astype(np.float64)
    pcm[0, 0] = 1.0 / 3.0
    for comp, bits in ((b"fl32", 32), (b"FL32", 32), (b"fl64", 64), (b"FL64", 64)):
        blob = synth.make_aiff(
            pcm.astype(np.float32) if bits == 32 else pcm,
            48000, bits, compression=comp,
        )
        got = _decode_one(blob)
        assert got.err == E.ERR_OK, comp
        assert got.bits_per_sample == bits
        np.testing.assert_array_equal(
            np.asarray(got.pcm), pcm.astype(np.float32)
        )
    # declared float with a mismatched sample size is unsupported
    bad = synth.make_aiff(pcm.astype(np.float32), 48000, 16, compression=b"fl32")
    assert _decode_one(bad).err == E.ERR_UNSUPPORTED


def test_aiff_wrong_comm_size_invalid(rng):
    """Comm size must be 18 (≙ aiff.rs:122-126 → InvalidData)."""
    pcm = rng.integers(-10, 10, size=(8, 1)).astype(np.int64)
    blob = synth.make_aiff(pcm, 44100, 16, comm_size=20)
    got = _decode_one(blob)
    assert got.err == E.ERR_INVALID


def test_aiff_bad_magic_unsupported(rng):
    pcm = rng.integers(-10, 10, size=(8, 1)).astype(np.int64)
    blob = b"XXXX" + synth.make_aiff(pcm)[4:]
    assert _decode_one(blob).err == E.ERR_UNSUPPORTED


def test_aiff_truncated_eof(rng):
    pcm = rng.integers(-32768, 32768, size=(100, 2)).astype(np.int64)
    blob = synth.make_aiff(pcm, 44100, 16)
    assert _decode_one(blob[:-40]).err == E.ERR_EOF


def test_aiff_skips_unknown_chunks(rng):
    pcm = rng.integers(-32768, 32768, size=(50, 1)).astype(np.int64)
    blob = synth.make_aiff(
        pcm, 44100, 16, extra_chunks=[(b"NAME", b"winterly"), (b"ANNO", b"x" * 7)]
    )
    got = _decode_one(blob)
    assert got.err == E.ERR_OK
    np.testing.assert_array_equal(got.pcm, pcm.astype(np.float32) / 32768.0)


def test_mixed_wav_aiff_batch(rng):
    """Cross-family batch: extension dispatch (main.rs:43-77) + order."""
    w = rng.integers(-32768, 32768, size=(300, 2)).astype(np.int64)
    a = rng.integers(-32768, 32768, size=(200, 1)).astype(np.int64)
    assets = [
        Asset("assets/w.wav", "w", "wav", synth.make_wav(w, 48000, 16)),
        Asset("assets/a.aif", "a", "aif", synth.make_aiff(a, 44100, 16)),
        Asset("assets/u.xyz", "u", "xyz", b"???"),
    ]
    batch = adt.decode_assets(assets)
    assert batch.names == ("w", "a", "u")
    assert batch.formats[:2] == ("wav", "aiff")
    np.testing.assert_array_equal(batch.file(0).pcm, w.astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(batch.file(1).pcm, a.astype(np.float32) / 32768.0)
    assert int(batch.err[2]) == E.ERR_UNSUPPORTED
    # consensus over the decoded files (≙ main.rs:91-120)
    rates = [int(batch.sample_rate[i]) for i in range(2)]
    chans = [int(batch.num_channels[i]) for i in range(2)]
    assert oracle.consensus(rates, chans) == (48000, 2)
