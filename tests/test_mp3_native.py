"""Native C++ mp3fe front-end vs the pure-Python reference front-end.

The two implement one output contract (dense per-granule tensors for the
DSP tail); these tests require bit-identical agreement on real LAME
streams, plus end-to-end correctness through the native decode_group path.
"""

import numpy as np
import pytest

from audio_decoder_tpu.codecs.mpeg import frontend as FE
from audio_decoder_tpu.codecs.mpeg import native as NA
from audio_decoder_tpu.codecs.mpeg import decoder as MD
from audio_decoder_tpu.io.assets import Asset

from . import codec_refs as CR
from . import mp3_oracle as MO

pytestmark = pytest.mark.skipif(
    not (CR.have_lame() and CR.have_mpg123() and NA.available()),
    reason="system lame/mpg123 or native toolchain not available",
)


def _sig(kind: str, n: int, ch: int, sr: int = 44100) -> np.ndarray:
    rng = np.random.default_rng(23)
    t = np.arange(n)
    if kind == "transient":
        s = 0.2 * np.sin(2 * np.pi * 880 * t / sr)
        s[::4000] = 0.9
    else:
        s = 0.3 * rng.standard_normal(n)
    sig = np.stack([s] * ch, 1)
    if ch == 2:
        sig[:, 1] = np.roll(sig[:, 1], 17) * 0.8
    return np.clip(sig * 30000, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize(
    "kind,ch,mode,bitrate,sr",
    [
        ("noise", 2, 1, 128, 44100),
        ("transient", 2, 0, 320, 48000),
        ("transient", 2, 1, 128, 44100),
        ("noise", 1, None, 128, 44100),
        ("noise", 2, 0, 64, 32000),
    ],
)
def test_native_bitexact_vs_python_frontend(kind, ch, mode, bitrate, sr):
    blob = CR.lame_encode(_sig(kind, int(sr * 0.25), ch, sr), sr, bitrate, mode=mode)
    an = FE.analyze(blob)
    p = NA.probe(blob)
    assert (p["sample_rate"], p["channels"], p["n_granules"], p["joint"]) == (
        an.sample_rate, an.channels, an.n_granules, an.joint_stereo,
    )
    r = NA.analyze_batch([blob], an.n_granules, an.channels, an.joint_stereo)
    np.testing.assert_array_equal(r["is_q"][0], an.is_q)
    np.testing.assert_array_equal(r["exp_b"][0], an.exp_b)
    np.testing.assert_array_equal(r["cfg"][0], an.blockcfg)
    if an.st_mode is not None:
        np.testing.assert_array_equal(r["st"][0], an.st_mode)


def test_native_probe_rejects_garbage():
    assert NA.probe(b"\x00" * 4096)["err"] != 0


def test_native_decode_group_end_to_end():
    blobs = {
        "a": CR.lame_encode(_sig("noise", 12000, 2), 44100, 128, mode=1),
        "b": CR.lame_encode(_sig("transient", 15000, 2), 44100, 192, mode=1),
    }
    assets = [Asset(path=k, name=k, ext="mp3", data=v) for k, v in blobs.items()]
    pieces = MD._decode_group_native(assets)
    got = {}
    for idxs, batch in pieces:
        for row, i in enumerate(idxs):
            got[assets[i].name] = batch.file(row)
    for name, blob in blobs.items():
        f = got[name]
        assert f.err == 0
        ref, _ = MO.decode(blob)
        n = min(len(ref), f.pcm.shape[0])
        rms = float(np.sqrt(((ref[:n, : f.num_channels] - f.pcm[:n]) ** 2).mean()))
        assert rms < 5e-7, f"{name}: rms {rms}"


def test_native_batch_rejects_channel_mismatch():
    """A blob whose real channel count differs from the batch's stride
    must fail with InvalidData instead of writing out of bounds (the
    output buffers are allocated for the caller-declared channels)."""
    from audio_decoder_tpu.codecs.mpeg import native as NA

    if not NA.available():
        import pytest

        pytest.skip("native front-end unavailable")
    stereo = CR.lame_encode(_sig("noise", 6000, 2), 44100, 128, mode=1)
    r = NA.lanes_batch([stereo], 16, 16384, channels=1)
    assert int(r["err"][0]) == 3  # InvalidData, nothing written
    assert not r["valid"].any()
    r2 = NA.analyze_batch([stereo], 16, channels=1, joint=False)
    assert int(r2["err"][0]) == 3


def test_session_single_walk_and_parity():
    """The Mp3Session front-end walks each blob's frames exactly ONCE
    (counter-verified) and its lane output is bit-identical to the
    classic per-call API."""
    blobs = [
        CR.lame_encode(_sig("noise", 12000, 2), 44100, 128, mode=1),
        CR.lame_encode(_sig("transient", 15000, 2), 44100, 192, mode=1),
        CR.lame_encode(_sig("noise", 9000, 2), 44100, 128, mode=1),
        b"\x00" * 2048,  # garbage: still exactly one walk
    ]
    w0 = NA.frame_walks()
    with NA.Mp3Session(blobs) as sess:
        assert NA.frame_walks() - w0 == len(blobs)  # open: 1 walk per blob
        assert [i["err"] for i in sess.infos] == [0, 0, 0, 3]
        assert sess.layers == [3, 3, 3, 0]
        g_cap = max(i["n_granules"] for i in sess.infos)
        m_cap = ((max(i["main_bytes"] for i in sess.infos) + 1023) // 1024) * 1024
        r = sess.lanes_batch([0, 1, 2], g_cap, m_cap, channels=2)
        # grouping, guard, and lane emission added NO further walks
        assert NA.frame_walks() - w0 == len(blobs)
    ref = NA.lanes_batch(blobs[:3], g_cap, m_cap, channels=2)
    for k in ("main", "start", "end", "limit", "big", "r1", "r2", "tsel",
              "c1sel", "valid", "exp_b", "cfg", "stflags", "sfr", "err",
              "n_granules", "sample_rate", "channels", "main_bytes"):
        np.testing.assert_array_equal(r[k], ref[k], err_msg=k)


def test_session_channel_guard():
    """The session's lane path rejects a channel-mismatched blob before
    writing (same guard as the classic batch entry)."""
    stereo = CR.lame_encode(_sig("noise", 6000, 2), 44100, 128, mode=1)
    with NA.Mp3Session([stereo]) as sess:
        r = sess.lanes_batch([0], 16, 16384, channels=1)
    assert int(r["err"][0]) == 3
    assert not r["valid"].any()


def test_decode_group_single_walk_per_blob():
    """End-to-end decode_group: with the native front-end, each blob is
    frame-walked exactly once (routing + grouping + guard + lanes all
    feed off the session's open-time walk)."""
    blobs = {
        "a": CR.lame_encode(_sig("noise", 12000, 2), 44100, 128, mode=1),
        "b": CR.lame_encode(_sig("transient", 15000, 2), 44100, 192, mode=1),
        "m": CR.lame_encode(_sig("noise", 8000, 1), 44100, 128, mode=None),
    }
    assets = [Asset(path=k, name=k, ext="mp3", data=v)
              for k, v in blobs.items()]
    w0 = NA.frame_walks()
    pieces = MD.decode_group(assets)
    assert NA.frame_walks() - w0 == len(assets)
    got = {}
    for idxs, batch in pieces:
        for row, i in enumerate(idxs):
            got[assets[i].name] = batch.file(row)
    for name, blob in blobs.items():
        f = got[name]
        assert f.err == 0
        ref, _ = MO.decode(blob)
        n = min(len(ref), f.pcm.shape[0])
        rms = float(np.sqrt(((ref[:n, : f.num_channels] - f.pcm[:n]) ** 2).mean()))
        assert rms < 5e-7, f"{name}: rms {rms}"
