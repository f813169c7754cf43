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
