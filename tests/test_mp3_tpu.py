"""Batched TPU MP3 decode path vs the NumPy oracle and mpg123.

The oracle (tests/mp3_oracle.py) is pinned to mpg123 at ~1e-7 RMS; the
TPU path (host front-end → jitted DSP tail) must match the oracle to
float32 roundoff across block types, stereo modes, rates, and batching.
The reference's MPEG decode is a TODO (blast/src/main.rs:44-54) — this is
the green-field half of the build.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_decoder_tpu.codecs.mpeg import frontend as FE
from audio_decoder_tpu.codecs.mpeg.dsp import mp3_dsp_tail
from audio_decoder_tpu.codecs.mpeg import decoder as MD
from audio_decoder_tpu.io.assets import Asset

from . import codec_refs as CR
from . import mp3_oracle as MO

pytestmark = pytest.mark.skipif(
    not (CR.have_lame() and CR.have_mpg123()),
    reason="system lame/mpg123 not available",
)

TOL = 5e-7  # float32 round-off vs the f64 oracle


def _sig(kind: str, n: int, ch: int, sr: int = 44100) -> np.ndarray:
    rng = np.random.default_rng(11)
    t = np.arange(n)
    if kind == "sine":
        s = 0.6 * np.sin(2 * np.pi * 440 * t / sr)
    elif kind == "noise":
        s = 0.3 * rng.standard_normal(n)
    else:  # transient — forces short blocks
        s = 0.2 * np.sin(2 * np.pi * 880 * t / sr)
        s[::4000] = 0.9
    sig = np.stack([s] * ch, 1)
    if ch == 2:
        sig[:, 1] = np.roll(sig[:, 1], 17) * 0.8
    return np.clip(sig * 30000, -32768, 32767).astype(np.int16)


def _tpu_decode(blob: bytes) -> tuple[np.ndarray, int]:
    an = FE.analyze(blob)
    G, C = an.n_granules, an.channels
    pcm = mp3_dsp_tail(
        jnp.asarray(an.is_q.reshape(1, G * C, 576)),
        jnp.asarray(an.exp_b.reshape(1, G * C * 61)),
        None if an.st_mode is None else jnp.asarray(an.st_mode.reshape(1, G * 576)),
        jnp.asarray(an.blockcfg.reshape(1, G * C)),
        jnp.asarray([an.rate_idx], jnp.int32),
        channels=C,
        joint_stereo=an.joint_stereo,
    )
    # kernel emits flat interleaved [B, S*C]; host reshape is free
    return (np.asarray(pcm[0]).reshape(-1, an.channels), an.sample_rate)


@pytest.mark.parametrize(
    "kind,ch,mode,bitrate,sr",
    [
        ("sine", 1, None, 128, 44100),
        ("noise", 2, 1, 128, 44100),      # joint stereo (MS) + reservoir
        ("transient", 2, 0, 320, 48000),  # short blocks, high rate
        ("transient", 2, 1, 128, 44100),  # short blocks + MS
        ("noise", 2, 0, 64, 32000),
    ],
)
def test_tpu_path_matches_oracle_and_mpg123(kind, ch, mode, bitrate, sr):
    pcm = _sig(kind, int(sr * 0.25), ch, sr)
    blob = CR.lame_encode(pcm, sr, bitrate, mode=mode)
    mine, sr_mine = _tpu_decode(blob)
    assert sr_mine == sr

    ref, _ = MO.decode(blob)
    n = min(len(ref), len(mine))
    assert n > sr // 10
    rms = float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean()))
    assert rms < TOL, f"oracle rms {rms}"

    mref, _ = CR.mpg123_decode(blob)
    n = min(len(mref), len(mine))
    rms = float(np.sqrt(((mref[:n] - mine[:n]) ** 2).mean()))
    assert rms < 5e-7, f"mpg123 rms {rms}"


def test_decode_group_batches_mixed_files():
    """Several MP3s of different lengths/modes through the registry path."""
    blobs = {
        "a": CR.lame_encode(_sig("sine", 9000, 1), 44100, 128),
        "b": CR.lame_encode(_sig("noise", 12000, 2), 44100, 128, mode=1),
        "c": CR.lame_encode(_sig("transient", 15000, 2), 44100, 192, mode=0),
    }
    assets = [Asset(path=k, name=k, ext="mp3", data=v) for k, v in blobs.items()]
    pieces = MD.decode_group(assets)
    got = {}
    for idxs, batch in pieces:
        for row, i in enumerate(idxs):
            got[assets[i].name] = batch.file(row)
    assert set(got) == set(blobs)
    for name, blob in blobs.items():
        f = got[name]
        assert f.err == 0
        assert f.sample_rate == 44100
        ref, _ = MO.decode(blob)
        n = min(len(ref), f.pcm.shape[0])
        rms = float(np.sqrt(((ref[:n, : f.num_channels] - f.pcm[:n]) ** 2).mean()))
        assert rms < TOL, f"{name}: rms {rms}"


def test_decode_group_flags_garbage():
    assets = [
        Asset(path="ok", name="ok", ext="mp3",
              data=CR.lame_encode(_sig("sine", 5000, 1), 44100, 128)),
        Asset(path="bad", name="bad", ext="mp3", data=b"\x00" * 4096),
    ]
    pieces = MD.decode_group(assets)
    errs = {}
    for idxs, batch in pieces:
        for row, i in enumerate(idxs):
            errs[assets[i].name] = int(np.asarray(batch.err)[row])
    assert errs["ok"] == 0
    assert errs["bad"] != 0


def test_registry_mixed_wav_mp3():
    """End-to-end decode_assets over a mixed WAV + MP3 folder."""
    from audio_decoder_tpu.codecs.registry import decode_assets
    from .synth import make_wav

    wav_pcm = (np.linspace(-0.5, 0.5, 2048)[:, None] * np.ones((1, 2)))
    wav = make_wav((wav_pcm * 32767).astype(np.int16), 44100)
    mp3 = CR.lame_encode(_sig("sine", 8000, 2), 44100, 128, mode=1)
    assets = [
        Asset(path="w.wav", name="w", ext="wav", data=wav),
        Asset(path="m.mp3", name="m", ext="mp3", data=mp3),
    ]
    batch = decode_assets(assets)
    assert batch.names == ("w", "m")
    assert tuple(np.asarray(batch.err)) == (0, 0)
    assert tuple(np.asarray(batch.sample_rate)) == (44100, 44100)
    # WAV stays bit-exact through the mixed path
    w = batch.file(0)
    np.testing.assert_array_equal(
        np.round(w.pcm * 32768.0).astype(np.int16),
        (wav_pcm * 32767).astype(np.int16),
    )
    # MP3 matches the oracle
    m = batch.file(1)
    ref, _ = MO.decode(mp3)
    n = min(len(ref), m.pcm.shape[0])
    rms = float(np.sqrt(((ref[:n] - m.pcm[:n]) ** 2).mean()))
    assert rms < TOL


@pytest.mark.parametrize("scfsi", [0b1111, 0b1010, 0b0011])
def test_scfsi_scalefactor_reuse(scfsi):
    """scfsi: granule 1 reuses granule 0's scalefactors per 4 sfb groups
    (ISO 2.4.2.7).  Crafted frames with nonzero scalefactors and scfsi
    bits set catch both failure modes: re-reading (bit-cursor shift →
    Huffman garbage) and not copying (granule-1 gains collapse to 0)."""
    from .mp3_writer import make_l3_frame

    vals = np.asarray([1, -1] * 24, np.int32)
    sfs = [1, 2, 3, 0, 1] * 5
    blob = make_l3_frame(
        sr=44100, mode=0, mode_ext=0, spectra=(vals, vals),
        scalefac=(sfs, sfs[::-1]), scalefac_compress=(5, 5),
        global_gain=(240, 235), scfsi=(scfsi, (scfsi >> 1) | 0b1000),
    ) * 8
    ref, _ = CR.mpg123_decode(blob)
    mine, _ = MO.decode(blob)
    n = min(len(ref), len(mine))
    scale = max(float(np.abs(ref).max()), 1e-9)
    assert float(np.sqrt(((ref[:n] - mine[:n]) ** 2).mean())) / scale < 2e-5
    pieces = MD.decode_group([Asset(path="x", name="x", ext="mp3", data=blob)])
    f = pieces[0][1].file(0)
    n = min(len(ref), f.pcm.shape[0])
    rms = float(np.sqrt(((ref[:n] - f.pcm[:n]) ** 2).mean())) / scale
    assert rms < 2e-5, rms
