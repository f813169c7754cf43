"""MP3 oracle validation against the system mpg123 decoder.

The NumPy oracle (tests/mp3_oracle.py) is the ground truth the batched TPU
decoder is built against; these tests pin the oracle itself to the
independent mpg123 implementation at ~1e-7 RMS (float32 precision).  LAME
produces the bitstreams, exercising the bit reservoir, MS stereo, short
blocks, and the full Huffman table set — none of which exist in the
reference (its MPEG decode is a TODO, blast/src/main.rs:44-54).
"""

import numpy as np
import pytest

from . import codec_refs as CR
from . import mp3_oracle as MO

pytestmark = pytest.mark.skipif(
    not (CR.have_lame() and CR.have_mpg123()),
    reason="system lame/mpg123 not available",
)

TOL = 5e-7  # float32 round-off territory; spec tolerance is far looser


def _sig(kind: str, n: int, ch: int) -> np.ndarray:
    rng = np.random.default_rng(11)
    t = np.arange(n)
    if kind == "sine":
        s = 0.6 * np.sin(2 * np.pi * 440 * t / 44100)
    elif kind == "noise":
        s = 0.3 * rng.standard_normal(n)
    else:  # transient — forces short blocks / window switching
        s = 0.2 * np.sin(2 * np.pi * 880 * t / 44100)
        s[::4000] = 0.9
    sig = np.stack([s] * ch, 1)
    if ch == 2:
        sig[:, 1] = np.roll(sig[:, 1], 17) * 0.8
    return np.clip(sig * 30000, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize(
    "kind,ch,mode,bitrate,sr",
    [
        ("sine", 1, None, 128, 44100),
        ("noise", 2, 1, 128, 44100),    # joint stereo (MS) + reservoir
        ("transient", 2, 0, 320, 48000),  # short blocks, high rate
        ("noise", 2, 0, 64, 32000),
    ],
)
def test_oracle_matches_mpg123(kind, ch, mode, bitrate, sr):
    pcm = _sig(kind, int(sr * 0.25), ch)
    blob = CR.lame_encode(pcm, sr, bitrate, mode=mode)
    ref, sr_ref = CR.mpg123_decode(blob)
    mine, sr_mine = MO.decode(blob)
    assert sr_ref == sr_mine == sr
    n = min(len(ref), len(mine))
    assert n > sr // 10
    rms = float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean()))
    assert rms < TOL, f"rms {rms}"


def test_frame_scan_rejects_garbage():
    with pytest.raises(ValueError):
        MO.decode(b"\x00" * 4096)


def test_frame_scan_resyncs_after_junk():
    pcm = _sig("sine", 11025, 1)
    blob = CR.lame_encode(pcm, 44100, 128)
    dirty = b"\x00\xff\xe0junkjunk" + blob  # false sync prefix
    ref, _ = CR.mpg123_decode(blob)
    mine, _ = MO.decode(dirty)
    n = min(len(ref), len(mine))
    rms = float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean()))
    assert rms < TOL


def test_gapless_trim_recovers_input_exactly():
    """The LAME info tag's encoder delay/padding + the 529-sample decoder
    delay locate the true audio inside the decoded PCM: the trimmed
    window has EXACTLY the encoder's input length and is sample-aligned
    (lag-0), for MPEG-1 and LSF, stereo and mono, at awkward lengths."""
    from audio_decoder_tpu.codecs.mpeg import decoder as MD
    from audio_decoder_tpu.io.assets import Asset

    rng = np.random.default_rng(17)
    for sr, ch, brate in ((44100, 2, 128), (44100, 1, 96), (22050, 2, 64)):
        n = int(sr * 0.7) + 313  # not a multiple of the frame size
        t = np.arange(n)
        s = 0.4 * np.sin(2 * np.pi * 441 * t / sr) + 0.05 * rng.standard_normal(n)
        pcm = (np.stack([s] * ch, 1) * 30000).clip(-32768, 32767).astype(np.int16)
        blob = CR.lame_encode(pcm, sr, brate, mode=1 if ch == 2 else None,
                              write_vbr_tag=True)
        pieces = MD.decode_group([Asset(path="x", name="x", ext="mp3",
                                        data=blob)])
        f = pieces[0][1].file(0)
        assert f.err == 0
        b = MD.gapless_bounds(blob, f.pcm.shape[0])
        assert b is not None, f"{sr}/{ch}: no tag found"
        start, length = b
        assert length == n, f"{sr}/{ch}: trimmed length {length} != input {n}"
        got = np.asarray(f.pcm[start : start + length, 0])
        ref = pcm[:, 0].astype(np.float32) / 32768.0
        # sample alignment: the lag-0 correlation must dominate its
        # neighbors (codec noise keeps it from being bit-exact)
        lags = {d: float(np.dot(got[1000 : n - 1000],
                                ref[1000 + d : n - 1000 + d]))
                for d in (-2, -1, 0, 1, 2)}
        assert max(lags, key=lags.get) == 0, lags
        rms = float(np.sqrt(((got - ref) ** 2).mean()))
        assert rms < 0.05  # codec noise only, no misalignment blowup


def test_lame_tag_found_past_false_sync():
    """A junk prefix that PARSES as a valid header (false sync) must not
    hide the LAME tag: the tag reader resyncs past unconfirmed
    candidates exactly like the decoder's statistical frame scan."""
    from audio_decoder_tpu.codecs.mpeg import frontend as FE

    rng = np.random.default_rng(5)
    s = 0.3 * rng.standard_normal(8000)
    pcm = (np.stack([s, s], 1) * 30000).clip(-32768, 32767).astype(np.int16)
    blob = CR.lame_encode(pcm, 44100, 128, mode=1, write_vbr_tag=True)
    clean = FE.lame_gapless(blob)
    assert clean is not None
    # header-shaped junk: the real first header's 4 bytes followed by
    # zeros — parses as a valid frame, but its Xing offset lands in the
    # zeros and the "next frame" is not a valid header
    dirty = blob[:4] + b"\x00" * 61 + blob
    assert FE.lame_gapless(dirty) == clean


def test_gapless_none_without_tag():
    from audio_decoder_tpu.codecs.mpeg import decoder as MD

    rng = np.random.default_rng(3)
    s = 0.3 * rng.standard_normal(8000)
    pcm = (np.stack([s, s], 1) * 30000).clip(-32768, 32767).astype(np.int16)
    blob = CR.lame_encode(pcm, 44100, 128, mode=1)  # no tag
    assert MD.gapless_bounds(blob, 100000) is None
