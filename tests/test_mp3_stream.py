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
