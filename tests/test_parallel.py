"""Multi-chip sharding on the virtual 8-device CPU mesh.

The reference is a single-process, 4-thread program with no distributed
machinery (SURVEY §2); the TPU build scales by data-parallel sharding of
the file batch over a ('data','model') mesh with consensus as the only
collective.  conftest forces an 8-device CPU platform so these run
anywhere.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_decoder_tpu.parallel.decode import (
    sharded_decode_fn,
    sharded_mp3_decode_fn,
)
from audio_decoder_tpu.parallel.mesh import make_mesh

from . import codec_refs as CR
from .synth import make_wav


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, model_parallel=2)


def test_sharded_wav_decode_matches_single(mesh8, rng):
    n_files = 8
    frames = 512
    blobs, refs = [], []
    for _ in range(n_files):
        pcm = np.clip(rng.standard_normal((frames, 2)) * 8000,
                      -32768, 32767).astype(np.int16)
        blobs.append(make_wav(pcm, 44100))
        refs.append(pcm)
    from audio_decoder_tpu.io.assets import pack_bytes

    bufs, lens = pack_bytes(blobs)
    fn = sharded_decode_fn(mesh8, bits=16, channels=2, max_frames=frames,
                           family="wav")
    with mesh8:
        pcm, meta, rate, ch = fn(jnp.asarray(bufs), jnp.asarray(lens))
        jax.block_until_ready(pcm)
    assert int(np.asarray(meta["err"]).sum()) == 0
    assert int(rate) == 44100 and int(ch) == 2
    for i, ref in enumerate(refs):
        got2 = np.asarray(pcm[i]).reshape(-1, 2)  # flat interleaved out
        got = np.round(got2 * 32768.0).astype(np.int16)
        np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(not (CR.have_lame() and CR.have_mpg123()),
                    reason="lame/mpg123 unavailable")
def test_sharded_mp3_decode_matches_single(mesh8, rng):
    from audio_decoder_tpu.codecs.mpeg import frontend as FE
    from audio_decoder_tpu.codecs.mpeg.decoder import _pack_python_lanes
    from . import mp3_oracle as MO

    s = 0.3 * rng.standard_normal(5000)
    pcm16 = np.clip(np.stack([s, np.roll(s, 9) * 0.8], 1) * 30000,
                    -32768, 32767).astype(np.int16)
    blob = CR.lame_encode(pcm16, 44100, 128, mode=1)
    ln = FE.analyze_lanes(blob)
    B = 8
    g_cap, m_cap = 16, 16384
    r = _pack_python_lanes([ln] * B, g_cap, m_cap, ln.channels)
    L = g_cap * ln.channels
    fn = sharded_mp3_decode_fn(
        mesh8, channels=ln.channels, joint_stereo=ln.joint_stereo,
        n_big=320, n_c1=144,
    )
    from audio_decoder_tpu.codecs.mpeg.decoder import fused_wire_args

    with mesh8:
        pcm = fn(*fused_wire_args(r, np.zeros(B, np.int32)))
        jax.block_until_ready(pcm)
    ref, _ = MO.decode(blob)
    n = min(len(ref), ln.n_granules * 576)
    for i in range(B):  # every data shard decodes identically + correctly
        got = np.asarray(pcm[i]).reshape(-1, ln.channels)[:n]
        rms = float(np.sqrt(((ref[:n] - got) ** 2).mean()))
        assert rms < 5e-7, f"shard {i}: rms {rms}"


def test_voice_sharded_render_matches_single(mesh8):
    """Model-parallel engine: voice axis sharded over 'model', one psum
    mixes the block; output must match the single-device renderer."""
    from audio_decoder_tpu.engine import commands as EC
    from audio_decoder_tpu.engine import state as ES
    from audio_decoder_tpu.engine.render import render_block
    from audio_decoder_tpu.parallel.render import (
        shard_engine_state,
        sharded_render_fn,
    )

    rng_ = np.random.default_rng(3)
    tracks = rng_.standard_normal((2, 512, 2)).astype(np.float32) * 0.2
    st = ES.empty_state(tracks, [512, 400], [2, 2], out_channels=2)
    reg = ES.HostRegistry(["a", "b"])
    proc = EC.CmdProcessor(reg, 1000)
    for line in [
        "load a -t s:100", "load b -t s:64",
        "seq a -p 4 -s 0,2 -j a:0.5", "seq b -p 2 -s 0,1",
        "start -v a", "start -v b",
    ]:
        st = EC.apply(st, reg, proc.parse(line))

    ref_st = st
    ref_blocks = []
    for _ in range(3):
        blk, ref_st = render_block(ref_st, frames=128, out_channels=2)
        ref_blocks.append(np.asarray(blk))

    fn = sharded_render_fn(mesh8, frames=128, out_channels=2)
    sh_st = shard_engine_state(st, mesh8)
    for i in range(3):
        blk, sh_st = fn(sh_st)
        np.testing.assert_allclose(
            np.asarray(blk), ref_blocks[i], atol=2e-6
        )


def test_uneven_batch_pads_and_masks(mesh8, rng):
    """B % data_axis != 0: pad_batch appends zero-length rows; the real
    files decode bit-exact, padding rows error out, and consensus is
    unaffected by them."""
    from audio_decoder_tpu.io.assets import pack_bytes
    from audio_decoder_tpu.parallel.decode import pad_batch

    n_files = 5  # data axis is 4 -> pads to 8
    frames = 512
    blobs, refs = [], []
    for _ in range(n_files):
        pcm = np.clip(rng.standard_normal((frames, 2)) * 8000,
                      -32768, 32767).astype(np.int16)
        blobs.append(make_wav(pcm, 44100))
        refs.append(pcm)
    bufs, lens = pack_bytes(blobs)
    data_size = mesh8.shape["data"]
    assert n_files % data_size != 0
    bufs_p, lens_p, valid = pad_batch(bufs, lens, data_size)
    assert bufs_p.shape[0] % data_size == 0
    assert valid.sum() == n_files

    fn = sharded_decode_fn(mesh8, bits=16, channels=2, max_frames=frames,
                           family="wav")
    with mesh8:
        pcm, meta, rate, ch = fn(jnp.asarray(bufs_p), jnp.asarray(lens_p))
        jax.block_until_ready(pcm)
    errs = np.asarray(meta["err"])
    assert (errs[valid] == 0).all()
    assert (errs[~valid] != 0).all()
    assert int(np.asarray(meta["n_frames"])[~valid].sum()) == 0
    # consensus collective ignored the padding rows
    assert int(rate) == 44100 and int(ch) == 2
    for i, ref in enumerate(refs):
        got2 = np.asarray(pcm[i]).reshape(-1, 2)  # flat interleaved out
        got = np.round(got2 * 32768.0).astype(np.int16)
        np.testing.assert_array_equal(got, ref)


@pytest.mark.skipif(not CR.have_twolame(), reason="twolame unavailable")
def test_sharded_layer2_matches_single(mesh8, rng):
    """Layer II subband synthesis dp-sharded over the mesh equals the
    single-device path."""
    from audio_decoder_tpu.codecs.mpeg import layer12 as L12
    from audio_decoder_tpu.parallel.decode import sharded_l12_fn

    s = 0.3 * rng.standard_normal(1152 * 3)
    pcm16 = np.clip(np.stack([s, np.roll(s, 13) * 0.7], 1) * 30000,
                    -32768, 32767).astype(np.int16)
    blob = CR.twolame_encode(pcm16, 44100, 192)
    an = L12.analyze_l2(blob)
    B = 8
    codes = np.broadcast_to(an.codes, (B,) + an.codes.shape).copy()
    cls = np.broadcast_to(an.cls, (B,) + an.cls.shape).copy()
    sf = np.broadcast_to(an.sf_idx, (B,) + an.sf_idx.shape).copy()
    single = L12.l12_synthesize(
        jnp.asarray(codes[:1]), jnp.asarray(cls[:1]), jnp.asarray(sf[:1]),
        channels=an.channels, steps=an.steps_per_frame)
    fn = sharded_l12_fn(mesh8, channels=an.channels, steps=an.steps_per_frame)
    with mesh8:
        pcm = fn(codes, cls, sf)
        jax.block_until_ready(pcm)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(pcm[b]), np.asarray(single[0]), atol=1e-6)


def test_decode_pcm_step_rejects_non_plain_pcm():
    """The fused step's static config is plain integer PCM; files the
    parsers now accept with OTHER codings (AIFC ulaw/ima4 declare a
    16-bit decoded width; sowt is little-endian) must err rather than
    fall through to the integer unpack (they used to decode as garbage
    with err=0)."""
    import sys

    from audio_decoder_tpu.parallel.decode import decode_pcm_step
    from audio_decoder_tpu.io.assets import pack_bytes

    sys.path.insert(0, "tests")
    from tests import ima_ref as IR
    from tests.synth import make_aiff, make_wav

    rng = np.random.default_rng(9)
    pcm = np.clip(rng.standard_normal((256, 2)) * 9000,
                  -32768, 32767).astype(np.int16)
    blobs = {
        "plain": make_aiff(pcm, 44100, 16),
        "sowt": make_aiff(pcm, 44100, 16, compression=b"sowt"),
        "ulaw": make_aiff(np.zeros((0, 2), np.int16), 8000, 16,
                          compression=b"ulaw",
                          data_override=bytes(range(256)),
                          frames_override=128),
        "ima4": make_aiff(np.zeros((0, 2), np.int16), 22050, 16,
                          compression=b"ima4",
                          data_override=IR.encode_ima4(pcm[:128]),
                          frames_override=128),
    }
    names = list(blobs)
    bufs, lens = pack_bytes([blobs[n] for n in names])
    _pcm_out, meta = decode_pcm_step(
        jnp.asarray(bufs), jnp.asarray(lens),
        bits=16, channels=2, max_frames=256, family="aiff")
    errs = {n: int(e) for n, e in zip(names, np.asarray(meta["err"]))}
    assert errs["plain"] == 0
    for n in ("sowt", "ulaw", "ima4"):
        assert errs[n] != 0, (n, errs)

    # and the WAV side: an extensible PCM file still passes
    wbufs, wlens = pack_bytes([make_wav(pcm, 44100, 16, extensible=True)])
    _p, wmeta = decode_pcm_step(
        jnp.asarray(wbufs), jnp.asarray(wlens),
        bits=16, channels=2, max_frames=256, family="wav")
    assert int(np.asarray(wmeta["err"])[0]) == 0


def test_sharded_flac_decode_matches_single(mesh8, rng):
    """FLAC fused decode dp-sharded over the mesh ('data' axis on byte
    rows AND lane descriptors) reproduces the single-device decode —
    DISTINCT per-file content so shard routing errors can't cancel."""
    from audio_decoder_tpu.codecs.flac import decoder as FD
    from audio_decoder_tpu.codecs.flac import frontend as FF
    from audio_decoder_tpu.codecs.flac.encode import encode_flac
    from audio_decoder_tpu.parallel.decode import sharded_flac_fn

    n_files, S = 8, 1500
    t = np.arange(S) / 44100.0
    refs, analyses = [], []
    for i in range(n_files):
        base = np.sin(2 * np.pi * (200.0 + 37.0 * i) * t) * (4000 + 900 * i)
        x = np.stack([base, base * 0.6 + rng.standard_normal(S) * 3], 1)
        ints = np.round(x).astype(np.int64)
        refs.append(ints)
        analyses.append(FF.analyze(encode_flac(
            ints.astype(np.float32) / 2.0 ** 15, 44100, bits=16,
            blocksize=256)))
    sizing = FD.sizing_for(analyses)
    for k in ("F", "Lr", "Lw", "Ld"):
        sizing[k] = max(sizing[k], 4)  # ≥1 element per data shard
    args, statics = FD.pack_group(analyses, sizing)
    fn = sharded_flac_fn(mesh8, **statics)
    with mesh8:
        pcm, ovf = fn(*args)
        jax.block_until_ready(pcm)
    assert not bool(np.asarray(ovf).any())
    single, _ = __import__(
        "audio_decoder_tpu.codecs.flac.device", fromlist=["flac_decode_batch"]
    ).flac_decode_batch(*args, **statics)
    np.testing.assert_array_equal(np.asarray(pcm), np.asarray(single))
    for i, ref in enumerate(refs):
        got3 = np.asarray(pcm[i]).reshape(-1, 2)[:S]  # flat interleaved
        got = np.round(got3.astype(np.float64) * 2.0 ** 15).astype(np.int64)
        np.testing.assert_array_equal(got, ref)
    # the shard_map Pallas assembly route (window_add_spmd: per-shard
    # tile-sequential kernels + one psum; interpret mode on the CPU
    # mesh) must be bit-identical to the sharded XLA scatter
    fn_p = sharded_flac_fn(mesh8, window_impl="pallas", **statics)
    with mesh8:
        pcm_p, ovf_p = fn_p(*args)
        jax.block_until_ready(pcm_p)
    np.testing.assert_array_equal(np.asarray(pcm_p), np.asarray(pcm))
    np.testing.assert_array_equal(np.asarray(ovf_p), np.asarray(ovf))
