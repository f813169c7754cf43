"""Sun AU / NeXT SND family: device decode vs independent references.

The AU container is fixed-header + raw samples, so every encoding rides
unpack kernels already pinned by the WAV/AIFF suites — these tests pin
the header semantics (encoding matrix, unknown-size sentinel, error
taxonomy), registry routing, host/device parser parity, and streaming.
The reference dispatches wav/aif only (blast/src/main.rs:38-77).
"""

from __future__ import annotations

import numpy as np
import pytest

from audio_decoder_tpu.codecs import au as AU
from audio_decoder_tpu.codecs import pcm_stream as PS
from audio_decoder_tpu.codecs.registry import decode_assets
from audio_decoder_tpu.core import errors as E
from audio_decoder_tpu.io.assets import Asset

from .synth import make_au

import jax.numpy as jnp


def _decode_one(data: bytes, ext: str = "au"):
    batch = decode_assets(
        [Asset(path=f"a.{ext}", name="a", ext=ext, data=data)])
    return batch.file(0)


def _device_meta(blob: bytes) -> dict:
    buf = jnp.asarray(np.frombuffer(blob, np.uint8))[None]
    lens = jnp.asarray([len(blob)], jnp.int32)
    return {k: int(v[0]) for k, v in AU.parse_meta_batch(buf, lens).items()}


@pytest.mark.parametrize("enc,bits", [(2, 8), (3, 16), (4, 24), (5, 32)])
def test_au_integer_pcm_bit_exact(rng, enc, bits):
    hi = 1 << (bits - 1)
    pcm = rng.integers(-hi, hi, size=(311, 2)).astype(np.int64)
    f = _decode_one(make_au(pcm, 22050, enc))
    assert f.err == 0 and f.sample_rate == 22050 and f.num_channels == 2
    assert f.bits_per_sample == bits and f.pcm.shape[0] == 311
    ref = pcm.astype(np.float32) / hi
    np.testing.assert_array_equal(np.asarray(f.pcm), ref)


@pytest.mark.parametrize("enc", [6, 7])
def test_au_float_pcm(rng, enc):
    x = (rng.standard_normal((200, 1)) * 0.5)
    f = _decode_one(make_au(x, 8000, enc))
    assert f.err == 0
    np.testing.assert_array_equal(
        np.asarray(f.pcm), x.astype(np.float32))


def test_au_g711_matches_audioop():
    audioop = pytest.importorskip("audioop")  # removed in py3.13

    raw = bytes(range(256)) * 2
    for enc, conv in ((1, audioop.ulaw2lin), (27, audioop.alaw2lin)):
        blob = make_au(np.zeros((0, 2), np.int64), 8000, enc,
                       data_override=raw)
        f = _decode_one(blob, ext="snd")
        assert f.err == 0 and f.pcm.shape[0] == len(raw) // 2
        ref = np.frombuffer(conv(raw, 2), "<i2").astype(np.float32) / 32768.0
        np.testing.assert_allclose(
            np.asarray(f.pcm).reshape(-1), ref, atol=1e-7)


def test_au_unknown_size_sentinel_and_short_data(rng):
    pcm = rng.integers(-32768, 32768, size=(100, 2)).astype(np.int64)
    # 0xFFFFFFFF → read to EOF
    blob = make_au(pcm, 44100, 3, data_size_override=0xFFFFFFFF)
    f = _decode_one(blob)
    assert f.err == 0 and f.pcm.shape[0] == 100
    # declared size larger than the file → clamped to what's present
    blob = make_au(pcm, 44100, 3, data_size_override=10 ** 6)
    f = _decode_one(blob)
    assert f.err == 0 and f.pcm.shape[0] == 100
    # data offset beyond 24 (annotation text) shifts the samples
    blob = make_au(pcm, 44100, 3, data_offset=40)
    f = _decode_one(blob)
    assert f.err == 0
    np.testing.assert_array_equal(
        np.asarray(f.pcm), pcm.astype(np.float32) / 32768.0)


def test_au_error_taxonomy(rng):
    pcm = rng.integers(-128, 128, size=(10, 1)).astype(np.int64)
    good = make_au(pcm, 8000, 2)
    assert _decode_one(b"NOPE" + good[4:]).err == E.ERR_UNSUPPORTED
    assert _decode_one(good[:20]).err == E.ERR_UNSUPPORTED  # short header
    bad_enc = good[:12] + (99).to_bytes(4, "big") + good[16:]
    assert _decode_one(bad_enc).err == E.ERR_UNSUPPORTED
    zero_ch = good[:20] + (0).to_bytes(4, "big") + good[24:]
    assert _decode_one(zero_ch).err == E.ERR_INVALID
    far_off = good[:4] + (10 ** 6).to_bytes(4, "big") + good[8:]
    assert _decode_one(far_off).err == E.ERR_EOF


@pytest.mark.parametrize("enc", sorted(AU.ENCODINGS))
def test_au_host_meta_matches_device(rng, enc):
    bits, is_float, companded = AU.ENCODINGS[enc]
    if companded:
        blob = make_au(np.zeros((0, 2), np.int64), 8000, enc,
                       data_override=bytes(range(256)))
    elif is_float:
        blob = make_au(rng.standard_normal((99, 2)) * 0.4, 16000, enc)
    else:
        hi = 1 << (bits - 1)
        blob = make_au(rng.integers(-hi, hi, size=(99, 2)).astype(np.int64),
                       16000, enc)
    dev = _device_meta(blob)
    assert dev["err"] == E.ERR_OK
    host = PS.parse_au_header(np.frombuffer(blob, np.uint8))
    for k in ("fmt_code", "channels", "sample_rate", "bits", "data_off",
              "data_size", "n_frames"):
        assert host[k] == dev[k], (enc, k, host[k], dev[k])


def test_au_stream_equals_batch_and_seeks(rng, tmp_path):
    import audio_decoder_tpu as adt

    pcm = rng.integers(-(1 << 23), 1 << 23, size=(1000, 2)).astype(np.int64)
    blob = make_au(pcm, 44100, 4)
    whole = np.asarray(_decode_one(blob).pcm)
    st = PS.PcmStream(blob, frames_per_chunk=128)
    assert st.container == "au" and st.total_samples == 1000
    np.testing.assert_array_equal(np.concatenate(list(st)), whole)
    p = tmp_path / "x.snd"
    p.write_bytes(blob)
    got = np.concatenate(list(adt.stream_file(
        str(p), pcm_frames_per_chunk=300, start_sample=123)))
    np.testing.assert_array_equal(got, whole[123:])
