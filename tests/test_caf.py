"""Apple CAF family: header semantics over already-pinned codecs.

CAF carries lpcm (both endiannesses, int + float), G.711 and Apple ima4
— all decoded by kernels the WAV/AIFF/AU suites pin — so these tests
target the container: the int64 chunk walk, the f64 sample-rate decode
(integer ops on device), the -1 to-EOF data-size convention, format
flags, routing, host/device parser parity and streaming.  The reference
dispatches wav/aif only (blast/src/main.rs:38-77).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from audio_decoder_tpu.codecs import caf as CF
from audio_decoder_tpu.codecs import pcm_stream as PS
from audio_decoder_tpu.codecs.registry import decode_assets
from audio_decoder_tpu.core import errors as E
from audio_decoder_tpu.io.assets import Asset

from . import ima_ref as IR
from .synth import make_caf


def _decode_one(data: bytes):
    batch = decode_assets(
        [Asset(path="a.caf", name="a", ext="caf", data=data)])
    return batch.file(0)


def _device_meta(blob: bytes) -> dict:
    buf = jnp.asarray(np.frombuffer(blob, np.uint8))[None]
    lens = jnp.asarray([len(blob)], jnp.int32)
    return {k: int(v[0]) for k, v in CF.parse_meta_batch(buf, lens).items()}


@pytest.mark.parametrize("bits,little", [(16, False), (16, True),
                                         (24, False), (32, True), (8, False)])
def test_caf_lpcm_int(rng, bits, little):
    hi = 1 << (bits - 1)
    pcm = rng.integers(-hi, hi, size=(257, 2)).astype(np.int64)
    f = _decode_one(make_caf(pcm, 48000, bits=bits, little=little))
    assert f.err == 0 and f.sample_rate == 48000
    np.testing.assert_array_equal(
        np.asarray(f.pcm), pcm.astype(np.float32) / hi)


@pytest.mark.parametrize("bits", [32, 64])
def test_caf_lpcm_float(rng, bits):
    x = rng.standard_normal((180, 1)) * 0.5
    f = _decode_one(make_caf(x, 44100, bits=bits, float_=True))
    assert f.err == 0
    np.testing.assert_array_equal(np.asarray(f.pcm), x.astype(np.float32))


def test_caf_g711_and_ima4(rng):
    audioop = pytest.importorskip("audioop")  # removed in py3.13

    raw = bytes(range(256)) * 2
    for codec, conv in ((b"ulaw", audioop.ulaw2lin),
                        (b"alaw", audioop.alaw2lin)):
        f = _decode_one(make_caf(np.zeros((0, 2), np.int64), 8000,
                                 codec=codec, data_override=raw))
        assert f.err == 0 and f.pcm.shape[0] == len(raw) // 2
        ref = np.frombuffer(conv(raw, 2), "<i2").astype(np.float32) / 32768.0
        np.testing.assert_allclose(
            np.asarray(f.pcm).reshape(-1), ref, atol=1e-7)

    pcm = np.clip(rng.standard_normal((4 * 64, 2)) * 9000,
                  -32768, 32767).astype(np.int16)
    data = IR.encode_ima4(pcm)
    f = _decode_one(make_caf(np.zeros((0, 2), np.int64), 22050,
                             codec=b"ima4", data_override=data))
    assert f.err == 0 and f.pcm.shape[0] == 4 * 64
    np.testing.assert_array_equal(
        np.round(np.asarray(f.pcm) * 32768.0).astype(np.int16),
        IR.decode_ima4(data, 2))


def test_caf_to_eof_size_fractional_rate_and_errors(rng):
    pcm = rng.integers(-32768, 32768, size=(100, 2)).astype(np.int64)
    # -1 data size: runs to EOF (streaming-write convention)
    f = _decode_one(make_caf(pcm, 44100, data_size_to_eof=True))
    assert f.err == 0 and f.pcm.shape[0] == 100
    # extra chunks before data are walked over
    f = _decode_one(make_caf(pcm, 44100,
                             extra_chunks=[(b"free", b"\0" * 17)]))
    assert f.err == 0 and f.pcm.shape[0] == 100
    # unknown codec → unsupported; truncated data → EOF; bad magic
    assert _decode_one(make_caf(pcm, 44100, codec=b"aac ",
                                data_override=b"x" * 64)
                       ).err == E.ERR_UNSUPPORTED
    blob = make_caf(pcm, 44100)
    assert _decode_one(blob[:-50]).err == E.ERR_EOF
    assert _decode_one(b"WRNG" + blob[4:]).err == E.ERR_UNSUPPORTED


@pytest.mark.parametrize("rate", [8000, 11025, 22050, 44100, 48000, 96000])
def test_caf_f64_rate_device_decode(rng, rate):
    """The device-side integer f64 decode recovers every audio rate."""
    pcm = rng.integers(-128, 128, size=(8, 1)).astype(np.int64)
    dev = _device_meta(make_caf(pcm, rate, bits=16))
    assert dev["err"] == E.ERR_OK and dev["sample_rate"] == rate


@pytest.mark.parametrize("kind", ["lpcm_be", "lpcm_le_f32", "ulaw", "ima4"])
def test_caf_host_meta_matches_device(rng, kind):
    if kind == "lpcm_be":
        blob = make_caf(rng.integers(-100, 100, size=(50, 2)
                                     ).astype(np.int64), 44100, bits=24)
    elif kind == "lpcm_le_f32":
        blob = make_caf(rng.standard_normal((50, 2)) * 0.3, 32000,
                        bits=32, little=True, float_=True)
    elif kind == "ulaw":
        blob = make_caf(np.zeros((0, 1), np.int64), 8000, codec=b"ulaw",
                        data_override=bytes(range(200)))
    else:
        pcm = np.clip(rng.standard_normal((128, 1)) * 9000,
                      -32768, 32767).astype(np.int16)
        blob = make_caf(np.zeros((0, 1), np.int64), 22050, codec=b"ima4",
                        data_override=IR.encode_ima4(pcm))
    dev = _device_meta(blob)
    assert dev["err"] == E.ERR_OK
    host = PS.parse_caf_header(np.frombuffer(blob, np.uint8))
    for k in ("fmt_code", "channels", "sample_rate", "bits", "data_off",
              "data_size", "n_frames", "flags"):
        assert host[k] == dev[k], (kind, k, host[k], dev[k])


def test_caf_stream_equals_batch_and_seeks(rng, tmp_path):
    import audio_decoder_tpu as adt

    pcm = rng.integers(-32768, 32768, size=(900, 2)).astype(np.int64)
    blob = make_caf(pcm, 44100, bits=16, little=True)
    whole = np.asarray(_decode_one(blob).pcm)
    st = PS.PcmStream(blob, frames_per_chunk=100)
    assert st.container == "caf"
    np.testing.assert_array_equal(np.concatenate(list(st)), whole)
    p = tmp_path / "x.caf"
    p.write_bytes(blob)
    got = np.concatenate(list(adt.stream_file(
        str(p), pcm_frames_per_chunk=200, start_sample=333)))
    np.testing.assert_array_equal(got, whole[333:])
    # ima4-in-CAF streams at the 64-frame packet quantum
    ipcm = np.clip(rng.standard_normal((6 * 64, 2)) * 9000,
                   -32768, 32767).astype(np.int16)
    iblob = make_caf(np.zeros((0, 2), np.int64), 22050, codec=b"ima4",
                     data_override=IR.encode_ima4(ipcm))
    iwhole = np.asarray(_decode_one(iblob).pcm)
    st = PS.PcmStream(iblob, frames_per_chunk=150)
    np.testing.assert_array_equal(np.concatenate(list(st)), iwhole)
    got = np.concatenate(list(st.chunks(start_sample=70)))
    np.testing.assert_array_equal(got, iwhole[70:])


def test_caf_pathological_rates_match_error_taxonomy(rng):
    """±inf/NaN/negative f64 rates map onto the error taxonomy in BOTH
    parsers (the host used to raise OverflowError on +inf)."""
    import struct as _st

    pcm = rng.integers(-128, 128, size=(16, 1)).astype(np.int64)
    base = make_caf(pcm, 44100, bits=16)
    for word in (b"\x7f\xf0\x00\x00\x00\x00\x00\x00",   # +inf
                 b"\x7f\xf8\x00\x00\x00\x00\x00\x01",   # NaN
                 b"\xc0\xe5\x88\x80\x00\x00\x00\x00"):  # -44100
        blob = base[:20] + word + base[28:]  # desc payload starts at 20
        assert _device_meta(blob)["err"] == E.ERR_INVALID, word
        with pytest.raises(E.InvalidDataError):
            PS.parse_caf_header(np.frombuffer(blob, np.uint8))
