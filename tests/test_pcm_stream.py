"""Chunked WAV/AIFF streaming decode (codecs.pcm_stream.PcmStream).

Two contracts:
  * the host header walk must agree with the vmapped device walk on every
    metadata field AND on the error taxonomy (the streaming path may not
    accept/reject different files than the batch path);
  * chunk concatenation must equal the one-shot batch decode BIT-EXACTLY
    at any chunk size and any seek offset (PCM unpack is stateless, so
    this pins the byte-window arithmetic).
"""

import struct

import numpy as np
import pytest

import jax.numpy as jnp

from audio_decoder_tpu.codecs import aiff as AF
from audio_decoder_tpu.codecs import pcm_stream as PS
from audio_decoder_tpu.codecs import wav as WV
from audio_decoder_tpu.codecs.registry import decode_assets
from audio_decoder_tpu.core import errors as E
from audio_decoder_tpu.io.assets import Asset

from .synth import make_aiff, make_wav


def _pcm(frames: int, ch: int, bits: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed + frames + bits)
    hi = 1 << (bits - 1)
    return rng.integers(-hi, hi, size=(frames, ch)).astype(np.int64)


def _device_meta(blob: bytes, parser) -> dict:
    buf = jnp.asarray(np.frombuffer(blob, np.uint8))[None]
    lens = jnp.asarray([len(blob)], jnp.int32)
    return {k: int(v[0]) for k, v in parser(buf, lens).items()}


WAV_BLOBS = {
    "pcm16": make_wav(_pcm(300, 2, 16), 44100, 16),
    "pcm8": make_wav(_pcm(301, 1, 8), 22050, 8),
    "pcm24": make_wav(_pcm(302, 2, 24), 48000, 24),
    "pcm32": make_wav(_pcm(303, 2, 32), 96000, 32),
    "f32": make_wav(_pcm(304, 2, 16).astype(np.float64) / 32768.0,
                    44100, 32, float32=True),
    "f64": make_wav(_pcm(305, 1, 16).astype(np.float64) / 32768.0,
                    44100, 64, float64=True),
    "extensible": make_wav(_pcm(306, 2, 24), 44100, 24, extensible=True),
    "chunky": make_wav(_pcm(307, 2, 16), 44100, 16,
                       extra_chunks=[(b"LIST", b"x" * 33), (b"fact", b"1234")]),
    "alaw": make_wav(np.zeros((0, 1), np.int64), 8000, 8,
                     data_override=bytes(range(256)) * 3,
                     fmt_code_override=6),
    "ulaw": make_wav(np.zeros((0, 1), np.int64), 8000, 8,
                     data_override=bytes(range(256)) * 3,
                     fmt_code_override=7),
    # IMA ADPCM: block-structured, fact chunk caps the frame count
    "adpcm": make_wav(np.zeros((0, 2), np.int64), 22050, 4,
                      data_override=bytes(256) + bytes(100),
                      fmt_code_override=0x11, block_align_override=256,
                      fmt_tail=struct.pack("<HH", 2, 249),
                      extra_chunks=[(b"fact", struct.pack("<I", 300))]),
}

AIFF_BLOBS = {
    "be16": make_aiff(_pcm(300, 2, 16), 44100, 16),
    "be24": make_aiff(_pcm(301, 1, 24), 48000, 24),
    "be8": make_aiff(_pcm(302, 2, 8), 22050, 8),
    "sowt": make_aiff(_pcm(303, 2, 16), 44100, 16, compression=b"sowt"),
    "fl32": make_aiff(_pcm(304, 2, 16).astype(np.float64) / 32768.0,
                      44100, 32, compression=b"fl32"),
    "fl64": make_aiff(_pcm(305, 1, 16).astype(np.float64) / 32768.0,
                      44100, 64, compression=b"fl64"),
    "offset": make_aiff(_pcm(306, 2, 16), 44100, 16, ssnd_offset=12),
    "chunky": make_aiff(_pcm(307, 2, 16), 32000, 16,
                        extra_chunks=[(b"ANNO", b"hi there!")]),
    # G.711: one stored byte per sample, COMM declares the decoded width
    "ulaw": make_aiff(np.zeros((0, 1), np.int64), 8000, 16,
                      compression=b"ulaw",
                      data_override=bytes(range(256)) * 3,
                      frames_override=768),
    "alaw": make_aiff(np.zeros((0, 2), np.int64), 8000, 16,
                      compression=b"ALAW",
                      data_override=bytes(range(256)) * 3,
                      frames_override=384),
}


@pytest.mark.parametrize("name", sorted(WAV_BLOBS))
def test_wav_host_meta_matches_device(name):
    blob = WAV_BLOBS[name]
    dev = _device_meta(blob, WV.parse_meta_batch)
    assert dev["err"] == E.ERR_OK
    host = PS.parse_wav_header(np.frombuffer(blob, np.uint8))
    for k in ("fmt_code", "channels", "sample_rate", "bits", "data_off",
              "data_size", "n_frames", "block_align"):
        assert host[k] == dev[k], (k, host[k], dev[k])


@pytest.mark.parametrize("name", sorted(AIFF_BLOBS))
def test_aiff_host_meta_matches_device(name):
    blob = AIFF_BLOBS[name]
    dev = _device_meta(blob, AF.parse_meta_batch)
    assert dev["err"] == E.ERR_OK
    host = PS.parse_aiff_header(np.frombuffer(blob, np.uint8))
    for k in ("fmt_code", "channels", "sample_rate", "bits", "data_off",
              "data_size", "n_frames"):
        assert host[k] == dev[k], (k, host[k], dev[k])


def test_host_error_taxonomy_matches_device():
    """Host raise class == device err code on the rejection paths."""
    wav16 = WAV_BLOBS["pcm16"]
    cases = [
        (b"\x00" * 64, WV.parse_meta_batch, PS.parse_wav_header),
        (wav16[:40], WV.parse_meta_batch, PS.parse_wav_header),  # truncated
        (make_wav(_pcm(10, 2, 16), 44100, 16, fmt_code_override=0x55),
         WV.parse_meta_batch, PS.parse_wav_header),  # unknown fmt code
        (b"FORM\x00\x00\x00\x04WHAT", AF.parse_meta_batch,
         PS.parse_aiff_header),
        (make_aiff(_pcm(10, 2, 16), 44100, 16, comm_size=20),
         AF.parse_meta_batch, PS.parse_aiff_header),  # bad COMM size
        (make_aiff(_pcm(10, 2, 16), 44100, 16)[:30], AF.parse_meta_batch,
         PS.parse_aiff_header),  # truncated SSND
    ]
    for blob, dev_parse, host_parse in cases:
        dev = _device_meta(blob, dev_parse)
        assert dev["err"] != E.ERR_OK
        with pytest.raises(E.DecodeError) as ei:
            host_parse(np.frombuffer(blob, np.uint8))
        assert ei.value.code == dev["err"], (blob[:12], ei.value)


def _whole(blob: bytes, ext: str) -> np.ndarray:
    batch = decode_assets([Asset(path=f"x.{ext}", name="x", ext=ext,
                                 data=blob)])
    f = batch.file(0)
    assert int(f.err) == 0
    return np.asarray(f.pcm[:, : f.num_channels])


@pytest.mark.parametrize("name,ext", [
    ("pcm16", "wav"), ("pcm24", "wav"), ("f32", "wav"), ("f64", "wav"),
    ("alaw", "wav"),
])
def test_wav_stream_equals_batch(name, ext):
    blob = WAV_BLOBS[name]
    whole = _whole(blob, ext)
    st = PS.PcmStream(blob, frames_per_chunk=64)
    assert st.container == "wav"
    assert (st.total_samples, st.channels) == whole.shape
    got = np.concatenate(list(st))
    assert np.array_equal(got, whole)


@pytest.mark.parametrize("name", ["be16", "sowt", "fl64", "offset", "ulaw",
                                  "alaw"])
def test_aiff_stream_equals_batch(name):
    blob = AIFF_BLOBS[name]
    whole = _whole(blob, "aif")
    st = PS.PcmStream(blob, frames_per_chunk=77)
    assert st.container == "aiff"
    got = np.concatenate(list(st))
    assert np.array_equal(got, whole)


def test_stream_seek_and_chunk_sizes():
    blob = WAV_BLOBS["pcm16"]
    whole = _whole(blob, "wav")
    a = np.concatenate(list(PS.PcmStream(blob, frames_per_chunk=7)))
    b = np.concatenate(list(PS.PcmStream(blob, frames_per_chunk=1000)))
    assert np.array_equal(a, b) and np.array_equal(a, whole)
    st = PS.PcmStream(blob, frames_per_chunk=64)
    for s in (1, 63, 64, 65, st.total_samples - 1, st.total_samples):
        got = list(st.chunks(start_sample=s))
        got = (np.concatenate(got) if got
               else np.zeros((0, st.channels), np.float32))
        assert np.array_equal(got, whole[s:]), f"seek {s}"
    with pytest.raises(ValueError):
        next(st.chunks(start_sample=st.total_samples + 1))


def test_stream_file_memmap_path(tmp_path):
    """io.stream.stream_file memory-maps WAV/AIFF from disk and yields
    multiple exact chunks."""
    import audio_decoder_tpu as adt

    blob = WAV_BLOBS["pcm24"]
    p = tmp_path / "x.wav"
    p.write_bytes(blob)
    whole = _whole(blob, "wav")
    chunks = list(adt.stream_file(str(p), pcm_frames_per_chunk=100))
    assert len(chunks) == -(-whole.shape[0] // 100) > 1
    assert np.array_equal(np.concatenate(chunks), whole)
    got = np.concatenate(
        list(adt.stream_file(str(p), pcm_frames_per_chunk=100,
                             start_sample=150)))
    assert np.array_equal(got, whole[150:])

    blob = AIFF_BLOBS["sowt"]
    q = tmp_path / "y.aifc"
    q.write_bytes(blob)
    got = np.concatenate(list(adt.stream_file(str(q),
                                              pcm_frames_per_chunk=90)))
    assert np.array_equal(got, _whole(blob, "aif"))

    with pytest.raises(E.IoError):
        PS.PcmStream(str(tmp_path / "missing.wav"))


def test_rf64_pcm_and_adpcm():
    """RF64/BW64 (EBU 64-bit RIFF): the data header carries the
    0xFFFFFFFF sentinel and real sizes live in ds64; decode must equal
    the plain-RIFF encoding of the same content, host and device parsers
    agree, streaming matches, and ds64's sampleCount plays fact's role
    for block-coded content."""
    import struct as _st

    from . import ima_ref as IR

    rng = np.random.default_rng(0xB1A57)
    pcm = np.clip(rng.standard_normal((700, 2)) * 9000,
                  -32768, 32767).astype(np.int16)
    plain = make_wav(pcm, 44100, 16)
    rf64 = make_wav(pcm, 44100, 16, rf64=True)
    for magic in (b"RF64", b"BW64"):
        blob = magic + rf64[4:]
        dev = _device_meta(blob, WV.parse_meta_batch)
        assert dev["err"] == E.ERR_OK
        host = PS.parse_wav_header(np.frombuffer(blob, np.uint8))
        for k in ("fmt_code", "channels", "sample_rate", "bits",
                  "data_off", "data_size", "n_frames", "block_align"):
            assert host[k] == dev[k], (magic, k, host[k], dev[k])
        got = _whole(blob, "wav")
        np.testing.assert_array_equal(got, _whole(plain, "wav"))
        st = PS.PcmStream(blob, frames_per_chunk=128)
        np.testing.assert_array_equal(np.concatenate(list(st)), got)

    # IMA ADPCM inside RF64: no fact chunk — ds64 sampleCount trims
    ba, ch = 256, 2
    spb = 1 + 8 * ((ba - 4 * ch) // (4 * ch))
    frames = 2 * spb + 9
    data = IR.encode(np.clip(rng.standard_normal((frames, ch)) * 9000,
                             -32768, 32767).astype(np.int16), ba)
    blob = make_wav(np.zeros((0, ch), np.int16), 44100, 4,
                    fmt_code_override=0x11, data_override=data,
                    block_align_override=ba,
                    fmt_tail=_st.pack("<HH", 2, spb),
                    rf64=True, rf64_sample_count=frames)
    dev = _device_meta(blob, WV.parse_meta_batch)
    host = PS.parse_wav_header(np.frombuffer(blob, np.uint8))
    assert dev["err"] == E.ERR_OK
    assert host["n_frames"] == dev["n_frames"] == frames
    got = _whole(blob, "wav")
    ref = IR.decode(data, ch, ba, n_frames=frames)
    np.testing.assert_array_equal(
        np.round(got * 32768.0).astype(np.int16), ref)

    # a truncated RF64 (ds64 claims more data than present) is EOF
    cut = rf64[: len(rf64) - 100]
    assert _device_meta(cut, WV.parse_meta_batch)["err"] == E.ERR_EOF
    with pytest.raises(E.UnexpectedEofError):
        PS.parse_wav_header(np.frombuffer(cut, np.uint8))
