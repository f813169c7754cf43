"""MPEG Layer I / Layer II decode (oracle + production path) vs mpg123.

Layer II streams come from the system twolame encoder; Layer I (no system
encoder exists) uses randomly-generated spec-valid frames — both decoders
(mpg123 and ours) must agree on the same bitstream, which exercises
allocation tables, scfsi, scalefactors, grouping and requantization.
The reference frames all layers but decodes none (main.rs:44-54).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_decoder_tpu.codecs.mpeg import decoder as MD
from audio_decoder_tpu.codecs.mpeg import layer12 as L12
from audio_decoder_tpu.io.assets import Asset

from . import codec_refs as CR
from . import mp12_oracle as M12

pytestmark = pytest.mark.skipif(
    not CR.have_mpg123(), reason="system mpg123 not available"
)

TOL = 5e-7
needs_twolame = pytest.mark.skipif(
    not CR.have_twolame(), reason="system twolame not available"
)


def _sig(sr: int, ch: int, seconds: float = 0.5) -> np.ndarray:
    rng = np.random.default_rng(sr + ch)
    s = 0.3 * rng.standard_normal(int(sr * seconds))
    x = np.stack([s] * ch, 1)
    if ch == 2:
        x[:, 1] = np.roll(x[:, 1], 9) * 0.8
    return np.clip(x * 30000, -32768, 32767).astype(np.int16)


L2_CASES = [  # mode: twolame enum — 0 stereo, 1 joint, 2 dual, 3 mono
    (44100, 192, None, 2), (48000, 256, 1, 2), (44100, 64, 0, 2),
    (32000, 128, 3, 1), (22050, 64, None, 2), (16000, 48, 3, 1),
]


@needs_twolame
@pytest.mark.parametrize("sr,br,mode,ch", L2_CASES)
def test_layer2_oracle_matches_mpg123(sr, br, mode, ch):
    blob = CR.twolame_encode(_sig(sr, ch), sr, br, mode=mode)
    ref, rsr = CR.mpg123_decode(blob)
    mine, msr = M12.decode_l2(blob)
    assert rsr == msr == sr
    n = min(len(ref), len(mine))
    rms = float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean()))
    assert rms < TOL, f"rms {rms}"


@needs_twolame
@pytest.mark.parametrize("sr,br,mode,ch", L2_CASES[:4])
def test_layer2_production_path(sr, br, mode, ch):
    blob = CR.twolame_encode(_sig(sr, ch), sr, br, mode=mode)
    ref, _ = CR.mpg123_decode(blob)
    pieces = MD.decode_group([Asset(path="x", name="x", ext="mp2", data=blob)])
    f = pieces[0][1].file(0)
    assert f.err == 0 and f.sample_rate == sr and f.format == "mp2"
    n = min(len(ref), f.pcm.shape[0])
    rms = float(np.sqrt(((ref[:n, : f.num_channels] - f.pcm[:n]) ** 2).mean()))
    assert rms < TOL, f"rms {rms}"


def _l1_frames(
    rng, n_frames: int, ch: int, max_alloc: int = 3,
    joint_ext: int | None = None,
) -> bytes:
    """Random spec-valid Layer I frames (448 kbps, 44.1 kHz).

    joint_ext: intensity-stereo mode_ext — subbands >= bound =
    4*(mode_ext+1) carry ONE shared allocation + sample set but
    per-channel scalefactors (ISO 2.4.1.6 / 2.4.2.3)."""
    out = bytearray()
    bound = 32 if joint_ext is None else (joint_ext + 1) * 4
    for _ in range(n_frames):
        bits: list[int] = []

        def put(v, n):
            for k in range(n - 1, -1, -1):
                bits.append((v >> k) & 1)

        mode = 1 if joint_ext is not None else (0 if ch == 2 else 3)
        hdr = ((0x7FF << 21) | (3 << 19) | (3 << 17) | (1 << 16)
               | (14 << 12) | (0 << 10) | (mode << 6)
               | ((joint_ext or 0) << 4))
        put(hdr, 32)
        alloc = rng.integers(0, max_alloc + 1, size=(ch, 32))
        alloc[1:, bound:] = alloc[:1, bound:]  # shared above the bound
        for sb in range(32):
            for c in range(ch if sb < bound else 1):
                put(int(alloc[c, sb]), 4)
        for sb in range(32):
            for c in range(ch):
                if alloc[c, sb]:
                    put(int(rng.integers(0, 63)), 6)
        for _t in range(12):
            for sb in range(32):
                for c in range(ch if sb < bound else 1):
                    a = int(alloc[c, sb])
                    if a:
                        nb = a + 1
                        put(int(rng.integers(0, (1 << nb) - 1)), nb)
        frame_len = (12 * 448000 // 44100) * 4
        by = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | (bits[i + j] if i + j < len(bits) else 0)
            by.append(b)
        by.extend(b"\x00" * (frame_len - len(by)))
        out += by
    return bytes(out)


@pytest.mark.parametrize("ch", [2, 1])
def test_layer1_random_frames_match_mpg123(ch):
    blob = _l1_frames(np.random.default_rng(7 + ch), 16, ch)
    ref, sr = CR.mpg123_decode(blob)
    assert sr == 44100
    mine, _ = M12.decode_l1(blob)
    n = min(len(ref), len(mine))
    rms = float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean()))
    assert rms < 1e-6, f"oracle rms {rms}"
    # production path (extension routing + device synthesis)
    pieces = MD.decode_group([Asset(path="x", name="x", ext="mp1", data=blob)])
    f = pieces[0][1].file(0)
    assert f.err == 0 and f.format == "mp1"
    n = min(len(ref), f.pcm.shape[0])
    rms = float(np.sqrt(((ref[:n, : f.num_channels] - f.pcm[:n]) ** 2).mean()))
    assert rms < 1e-6, f"device rms {rms}"


@needs_twolame
def test_mixed_layers_one_batch():
    """Layer I + II + III decode together through the registry."""
    if not CR.have_lame():
        pytest.skip("lame unavailable")
    l1 = _l1_frames(np.random.default_rng(3), 10, 2)
    l2 = CR.twolame_encode(_sig(44100, 2), 44100, 192)
    l3 = CR.lame_encode(_sig(44100, 2), 44100, 128, mode=1)
    from audio_decoder_tpu.codecs.registry import decode_assets

    batch = decode_assets([
        Asset(path="a.mp1", name="a", ext="mp1", data=l1),
        Asset(path="b.mp2", name="b", ext="mp2", data=l2),
        Asset(path="c.mp3", name="c", ext="mp3", data=l3),
    ])
    assert tuple(np.asarray(batch.err)) == (0, 0, 0)
    assert batch.formats == ("mp1", "mp2", "mp3")
    for i, (dec, blob) in enumerate([(M12.decode_l1, l1), (M12.decode_l2, l2)]):
        f = batch.file(i)
        ref, _ = dec(blob)
        n = min(len(ref), f.pcm.shape[0])
        rms = float(np.sqrt(((ref[:n, : f.num_channels] - f.pcm[:n]) ** 2).mean()))
        assert rms < 1e-6


@pytest.mark.parametrize("joint_ext", [0, 1, 3])
def test_layer1_joint_stereo_matches_mpg123(joint_ext):
    """Layer I intensity stereo: one shared allocation + sample set above
    bound = 4*(mode_ext+1), per-channel scalefactors (ISO 2.4.2.3)."""
    blob = _l1_frames(np.random.default_rng(40 + joint_ext), 16, 2,
                      joint_ext=joint_ext)
    ref, sr = CR.mpg123_decode(blob)
    assert sr == 44100
    mine, _ = M12.decode_l1(blob)
    n = min(len(ref), len(mine))
    rms = float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean()))
    assert rms < 1e-6, f"oracle rms {rms}"
    pieces = MD.decode_group([Asset(path="x", name="x", ext="mp1", data=blob)])
    f = pieces[0][1].file(0)
    assert f.err == 0
    n = min(len(ref), f.pcm.shape[0])
    rms = float(np.sqrt(((ref[:n] - f.pcm[:n]) ** 2).mean()))
    assert rms < 1e-6, f"device rms {rms}"
