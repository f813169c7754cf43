"""Chunked single-file streaming decode (decoder.Mp3Stream).

The stream re-decodes a 2-granule warm-up at every chunk head (bit
reservoir is pure byte-window math; IMDCT overlap is one granule of
memory whose forward tail depends only on that granule's own spectra;
the synthesis FIR window is shorter than one granule's 18 V-steps), so
concatenated chunks must equal the one-shot batch decode BIT-EXACTLY —
at any chunk size, for MPEG-1 and LSF, mono and stereo, with the bit
reservoir active across chunk boundaries.
"""

import numpy as np
import pytest

from audio_decoder_tpu.codecs.mpeg import decoder as MD
from audio_decoder_tpu.core import errors as E
from audio_decoder_tpu.io.assets import Asset

from . import codec_refs as CR

pytestmark = pytest.mark.skipif(
    not CR.have_lame(), reason="system lame not available"
)


def _sig(sr: int, ch: int, seconds: float, seed: int = 23) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n)
    s = 0.25 * np.sin(2 * np.pi * 660 * t / sr) + 0.1 * rng.standard_normal(n)
    s[::1777] = 0.9  # transients: short blocks + reservoir churn
    x = np.stack([s, np.roll(s, 7) * 0.8], 1)[:, :ch]
    return np.clip(x * 30000, -32768, 32767).astype(np.int16)


def _whole(blob: bytes) -> np.ndarray:
    pieces = MD.decode_group([Asset(path="x", name="x", ext="mp3", data=blob)])
    f = pieces[0][1].file(0)
    assert f.err == 0
    return np.asarray(f.pcm[:, : f.num_channels])


@pytest.mark.parametrize("sr,ch,br,gpc", [
    (44100, 2, 128, 64),   # MPEG-1 joint stereo
    (44100, 2, 320, 96),   # high rate: large frames, heavy reservoir
    (22050, 1, 32, 64),    # LSF mono, 1 granule/frame
    (44100, 2, 128, 8),    # pathological: chunk = 4 frames
])
def test_stream_equals_batch_decode(sr, ch, br, gpc):
    mode = 1 if ch == 2 else None
    blob = CR.lame_encode(_sig(sr, ch, 2.0), sr, br, mode=mode, quality=2)
    whole = _whole(blob)
    st = MD.Mp3Stream(blob, granules_per_chunk=gpc)
    assert st.sample_rate == sr and st.channels == ch
    got = np.concatenate(list(st))
    assert got.shape == (st.total_samples, ch)
    assert len(got) == len(whole)
    assert np.array_equal(got, whole), (
        f"max diff {np.abs(got - whole).max()}"
    )


def test_stream_chunk_sizes_agree():
    blob = CR.lame_encode(_sig(44100, 2, 2.0), 44100, 192, mode=1)
    a = np.concatenate(list(MD.Mp3Stream(blob, granules_per_chunk=32)))
    b = np.concatenate(list(MD.Mp3Stream(blob, granules_per_chunk=200)))
    assert np.array_equal(a, b)


def test_stream_file_wrapper(tmp_path):
    """io.stream.stream_file routes .mp3 to Mp3Stream and falls back to
    the one-shot decode for WAV (single yielded chunk)."""
    import audio_decoder_tpu as adt

    blob = CR.lame_encode(_sig(44100, 2, 1.0), 44100, 128, mode=1)
    p = tmp_path / "x.mp3"
    p.write_bytes(blob)
    got = np.concatenate(list(adt.stream_file(str(p), granules_per_chunk=32)))
    assert np.array_equal(got, _whole(blob))

    from .synth import make_wav

    pcm = (np.linspace(-15000, 15000, 441)[:, None]
           * np.ones((1, 2))).astype(np.int16)
    w = tmp_path / "y.wav"
    w.write_bytes(make_wav(pcm, 44100, 16))
    chunks = list(adt.stream_file(str(w)))
    assert len(chunks) == 1 and chunks[0].shape == (441, 2)


def test_stream_rejects_layer2():
    if not CR.have_twolame():
        pytest.skip("twolame unavailable")
    blob = CR.twolame_encode(_sig(44100, 2, 0.5), 44100, 192)
    with pytest.raises(E.UnsupportedFormatError):
        MD.Mp3Stream(blob)


def test_stream_rejects_garbage():
    with pytest.raises(E.DecodeError):
        MD.Mp3Stream(b"\x00" * 4096)
    with pytest.raises(E.DecodeError):
        MD.mpeg_stream(b"\x00" * 4096)


# ---- sample-exact seek ------------------------------------------------


def test_stream_seek_bit_identical():
    """chunks(start_sample=N) must equal oneshot[N:] bit-exactly for any
    N — including mid-granule offsets and the empty tail."""
    blob = CR.lame_encode(_sig(44100, 2, 1.5), 44100, 128, mode=1)
    whole = _whole(blob)
    st = MD.Mp3Stream(blob, granules_per_chunk=48)
    for s in (0, 1, 575, 576, 577, 10000, st.total_samples - 1,
              st.total_samples):
        got = list(st.chunks(start_sample=s))
        got = (np.concatenate(got) if got
               else np.zeros((0, st.channels), np.float32))
        assert np.array_equal(got, whole[s:]), f"seek {s}"
    with pytest.raises(ValueError):
        next(st.chunks(start_sample=-1))
    with pytest.raises(ValueError):
        next(st.chunks(start_sample=st.total_samples + 1))


# ---- Layer I/II streaming (L12Stream) + layer-probing factory ---------


def _whole_l12(blob: bytes, ext: str) -> np.ndarray:
    pieces = MD.decode_group([Asset(path="x", name="x", ext=ext, data=blob)])
    f = pieces[0][1].file(0)
    assert f.err == 0
    return np.asarray(f.pcm[:, : f.num_channels])


@pytest.mark.parametrize("fpc", [2, 8, 1000])
def test_layer2_stream_equals_batch(fpc):
    """L12Stream chunk concatenation == one-shot Layer II decode, at the
    minimum chunk size (2 frames: warm-up is 1 frame), a small size, and
    one larger than the stream (single chunk, no warm-up)."""
    if not CR.have_twolame():
        pytest.skip("twolame unavailable")
    blob = CR.twolame_encode(_sig(44100, 2, 1.0), 44100, 192)
    whole = _whole_l12(blob, "mp2")
    st = MD.mpeg_stream(blob, frames_per_chunk=fpc)
    assert isinstance(st, MD.L12Stream)
    assert st.layer == 2 and st.sample_rate == 44100 and st.channels == 2
    got = np.concatenate(list(st))
    assert got.shape == (st.total_samples, 2) == whole.shape
    assert np.array_equal(got, whole)


def test_layer2_stream_seek():
    if not CR.have_twolame():
        pytest.skip("twolame unavailable")
    blob = CR.twolame_encode(_sig(44100, 2, 1.0), 44100, 192)
    whole = _whole_l12(blob, "mp2")
    st = MD.L12Stream(blob, frames_per_chunk=8)
    for s in (1, 1151, 1152, 1153, st.total_samples):
        got = list(st.chunks(start_sample=s))
        got = np.concatenate(got) if got else np.zeros((0, 2), np.float32)
        assert np.array_equal(got, whole[s:]), f"seek {s}"
    with pytest.raises(ValueError):
        next(st.chunks(start_sample=st.total_samples + 1))


def test_layer1_stream_equals_batch():
    """Layer I: 12 V-steps/frame → 2-frame warm-up (FIR history is 16
    steps); crafted spec-valid frames (no system Layer I encoder)."""
    from .test_layer12 import _l1_frames

    blob = _l1_frames(np.random.default_rng(7), 16, 2)
    whole = _whole_l12(blob, "mp1")
    st = MD.mpeg_stream(blob, frames_per_chunk=4)
    assert isinstance(st, MD.L12Stream)
    assert st.layer == 1 and st.WARMUP == 2
    got = np.concatenate(list(st))
    assert np.array_equal(got, whole)
    mid = np.concatenate(list(st.chunks(start_sample=777)))
    assert np.array_equal(mid, whole[777:])


def test_factory_routes_layer3():
    blob = CR.lame_encode(_sig(44100, 2, 0.5), 44100, 128, mode=1)
    st = MD.mpeg_stream(blob, granules_per_chunk=32)
    assert isinstance(st, MD.Mp3Stream)


def test_stream_file_layer2_and_seek(tmp_path):
    """io.stream.stream_file routes .mp2 to L12Stream via the factory and
    honors start_sample for both MPEG and WAV paths."""
    if not CR.have_twolame():
        pytest.skip("twolame unavailable")
    import audio_decoder_tpu as adt

    blob = CR.twolame_encode(_sig(44100, 2, 1.0), 44100, 192)
    whole = _whole_l12(blob, "mp2")
    p = tmp_path / "x.mp2"
    p.write_bytes(blob)
    got = np.concatenate(list(adt.stream_file(str(p), frames_per_chunk=8)))
    assert np.array_equal(got, whole)
    got = np.concatenate(
        list(adt.stream_file(str(p), frames_per_chunk=8, start_sample=999)))
    assert np.array_equal(got, whole[999:])

    from .synth import make_wav

    pcm = (np.linspace(-15000, 15000, 441)[:, None]
           * np.ones((1, 2))).astype(np.int16)
    w = tmp_path / "y.wav"
    w.write_bytes(make_wav(pcm, 44100, 16))
    (chunk,) = list(adt.stream_file(str(w), start_sample=41))
    assert chunk.shape == (400, 2)
