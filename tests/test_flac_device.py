"""Device FLAC decode vs the dual-oracle corpus.

The streams come from the clear-room encoder (tests/flac_writer.py),
whose output the round-2 foundation cross-validated bit-exactly against
BOTH the clear-room reference decoder (tests/flac_ref.py) and
libavcodec (tests/test_flac_oracle.py).  Here the fused device program
(audio_decoder_tpu/codecs/flac/) must reproduce the source samples
BIT-EXACTLY — FLAC is lossless and every decode stage (rice scan,
host-split quotient outliers, predictors, stereo undo, f32 scaling by a
power of two) is exact by construction.

A beyond-reference family: the reference project (blast) has no FLAC
decoder, so there is no reference file to cite — the oracle chain is
the parity anchor instead.
"""

from __future__ import annotations

import numpy as np
import pytest

from audio_decoder_tpu.codecs.flac import decoder, frontend
from audio_decoder_tpu.core import errors as E
from audio_decoder_tpu.io.assets import Asset

from . import flac_writer as FW
from .test_flac_oracle import STEREO_MODES, SUBFRAME_CASES, _material


def _device_decode(blobs):
    """decode_group over a blob list → [(int_pcm [S,C] | None, err)]."""
    assets = [Asset(f"f{i}", f"f{i}", "flac", b)
              for i, b in enumerate(blobs)]
    out = {}
    for idxs, batch in decoder.decode_group(assets):
        pcm = np.asarray(batch.pcm)
        err = np.asarray(batch.err)
        vf = np.asarray(batch.valid_frames)
        bits = np.asarray(batch.bits_per_sample)
        nch = np.asarray(batch.num_channels)
        for j, i in enumerate(idxs):
            if err[j] != E.ERR_OK:
                out[i] = (None, int(err[j]))
            else:
                scale = 2.0 ** (int(bits[j]) - 1)
                ints = np.round(
                    pcm[j, : vf[j], : nch[j]].astype(np.float64) * scale
                ).astype(np.int64)
                out[i] = (ints, 0)
    return [out[i] for i in range(len(blobs))]


def _check_exact(blobs, xs):
    got = _device_decode(blobs)
    for (ints, err), x in zip(got, xs):
        assert err == 0
        np.testing.assert_array_equal(ints, x.astype(np.int64))


def test_subframe_matrix_one_batch(rng):
    """All 13 subframe layouts (stereo mode cycling) in ONE group call —
    exercises multi-file lane packing, frame/sublane offsets."""
    blobs, xs = [], []
    for i, (name, kw) in enumerate(SUBFRAME_CASES):
        x = _material(rng, kw=kw)
        blobs.append(FW.encode_file(x, 44100, 16, blocksize=256,
                                    stereo=STEREO_MODES[i % 4],
                                    subframe_kw=kw))
        xs.append(x)
    _check_exact(blobs, xs)


def test_stereo_modes_batched(rng):
    blobs, xs = [], []
    for mode in STEREO_MODES:
        x = _material(rng, frames=1100)
        blobs.append(FW.encode_file(x, 48000, 16, blocksize=512,
                                    stereo=mode))
        xs.append(x)
    _check_exact(blobs, xs)


@pytest.mark.parametrize("bps,hi", [(8, 127), (16, 1 << 15), (24, 1 << 23)])
def test_sample_sizes(rng, bps, hi):
    x = _material(rng, frames=1500, ch=1, hi=hi)
    _check_exact([FW.encode_file(x, 48000, bps, blocksize=576)], [x])


def test_partial_tail_frame_and_odd_rate(rng):
    x = _material(rng, frames=1000)
    blob = FW.encode_file(x, 12345, 16, blocksize=576, stereo="mid_side")
    (ints, err), = _device_decode([blob])
    assert err == 0
    np.testing.assert_array_equal(ints, x)


def test_lpc_order_32(rng):
    coefs = [512] + [0] * 30 + [256]
    kw = dict(kind="lpc", lpc_coefs=coefs, lpc_shift=11)
    x = _material(rng, frames=900)
    _check_exact([FW.encode_file(x, 44100, 16, blocksize=448,
                                 subframe_kw=kw)], [x])


def test_quotient_outliers_direct_values(rng):
    """A badly-fitted LPC (large residuals, rice q > Q_CAP) must still
    decode exactly via the host-split direct-value lanes."""
    x = _material(rng, frames=2500, hi=1 << 23)
    kw = dict(kind="lpc", lpc_coefs=[1200, -600, 300, -100], lpc_shift=10)
    blob = FW.encode_file(x, 44100, 24, blocksize=1024, stereo="mid_side",
                          subframe_kw=kw)
    an = frontend.analyze(blob)
    assert an.dv_val.size > 0  # the stream really exercises the path
    _check_exact([blob], [x])


def test_mixed_feature_streams():
    r = np.random.default_rng(77)
    kinds = [kw for _, kw in SUBFRAME_CASES]
    r.shuffle(kinds)
    x = r.integers(-9000, 9000, size=(2100, 2)).astype(np.int32)
    x[100:200] = 0
    x[300:380] = 777
    blob = FW.encode_file(x, 44100, 16, blocksize=256, stereo="mid_side",
                          subframe_kw=kinds)
    _check_exact([blob], [x])


def test_window_impl_pallas_matches_xla(rng):
    """The Pallas window-add assembly (ops/window_add.py — the TPU-path
    value/PCM scatter replacement) produces BIT-IDENTICAL decode output
    to the XLA scatter path on a mixed-feature multi-file group.  On CPU
    the kernel runs in interpret mode (same semantics, no Mosaic)."""
    from audio_decoder_tpu.codecs.flac.device import flac_decode_wire

    r = np.random.default_rng(31)
    kinds = [kw for _, kw in SUBFRAME_CASES]
    blobs = []
    for i in range(3):
        r.shuffle(kinds)
        x = r.integers(-9000, 9000, size=(1500 + 257 * i, 2)).astype(np.int32)
        blobs.append(FW.encode_file(x, 44100, 16, blocksize=256,
                                    stereo=STEREO_MODES[i % 4],
                                    subframe_kw=kinds))
    analyses = [frontend.analyze(b) for b in blobs]
    args, statics = decoder.pack_wire(analyses)
    pcm_x, ovf_x = flac_decode_wire(*args, window_impl="xla", **statics)
    pcm_p, ovf_p = flac_decode_wire(*args, window_impl="pallas", **statics)
    np.testing.assert_array_equal(np.asarray(pcm_x), np.asarray(pcm_p))
    np.testing.assert_array_equal(np.asarray(ovf_x), np.asarray(ovf_p))


def test_error_pieces_mixed_with_good(rng):
    x = _material(rng, frames=512, ch=1)
    good = FW.encode_file(x, 44100, 16, blocksize=256)
    bad = bytearray(good)
    bad[-3] ^= 0x01  # last frame body → CRC-16 mismatch
    res = _device_decode([bytes(bad), good, b"not flac at all"])
    assert res[0] == (None, E.ERR_INVALID)
    assert res[2] == (None, E.ERR_INVALID)
    np.testing.assert_array_equal(res[1][0], x)


def test_wide_sample_size_decodes_via_host(rng):
    """32-bit streams are beyond the fused device program's i32/f32
    exactness window but MUST still decode (RFC 9639 allows them): the
    group dispatcher routes them to the host decoder and the batch PCM
    is the nearest-f32 of the exact integers (test_flac_host.py pins
    the exact-integer surface)."""
    x = _material(rng, frames=300, ch=1, hi=1 << 30).astype(np.int64)
    blob = FW.encode_file(x, 44100, 32, blocksize=256)
    (ints, err), = _device_decode([blob])
    assert err == E.ERR_OK
    want = np.round(
        (x.astype(np.float64) * 2.0 ** -31).astype(np.float32)
        .astype(np.float64) * 2.0 ** 31).astype(np.int64)
    np.testing.assert_array_equal(ints, want)


def test_registry_dispatch(rng, tmp_path):
    """End-to-end through decode_dir: .flac routes to the FLAC model and
    lands in the ordered AudioBatch alongside other families."""
    from audio_decoder_tpu.codecs.registry import decode_dir

    x = _material(rng, frames=700)
    (tmp_path / "song.flac").write_bytes(
        FW.encode_file(x, 44100, 16, blocksize=256))
    batch, names = decode_dir(str(tmp_path))
    assert names == {"song": 0}
    assert np.asarray(batch.err)[0] == 0
    assert np.asarray(batch.sample_rate)[0] == 44100
    got = np.round(
        np.asarray(batch.pcm)[0, :700, :2].astype(np.float64) * 32768.0
    ).astype(np.int64)
    np.testing.assert_array_equal(got, x)


def test_stream_matches_oneshot(rng, tmp_path):
    """FlacStream chunks concatenate to the one-shot decode bit-for-bit
    and compile ONE shape for the whole file; seek is sample-exact."""
    from audio_decoder_tpu.codecs.flac.stream import FlacStream
    from audio_decoder_tpu.io.stream import stream_file

    kinds = [kw for _, kw in SUBFRAME_CASES]
    x = _material(rng, frames=6000)
    blob = FW.encode_file(x, 44100, 16, blocksize=512, stereo="left_side",
                          subframe_kw=kinds)
    (one, err), = _device_decode([blob])
    assert err == 0

    st = FlacStream(blob, frames_per_chunk=3)
    assert (st.total_samples, st.channels) == (6000, 2)
    got = np.concatenate(list(st.chunks()), axis=0)
    ints = np.round(got.astype(np.float64) * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(ints, one)
    np.testing.assert_array_equal(ints, x)

    # sample-exact seek into the middle of a frame
    seek = np.concatenate(list(st.chunks(start_sample=1234)), axis=0)
    np.testing.assert_array_equal(
        np.round(seek.astype(np.float64) * 32768.0).astype(np.int64),
        x[1234:])

    # io.stream_file routes .flac here
    p = tmp_path / "long.flac"
    p.write_bytes(blob)
    via = np.concatenate(
        list(stream_file(str(p), flac_frames_per_chunk=5)), axis=0)
    np.testing.assert_array_equal(
        np.round(via.astype(np.float64) * 32768.0).astype(np.int64), x)


def test_random_streams_bit_exact():
    """Randomized feature fuzz: random bps/blocksize/stereo/layout mix
    (random LPC coefficients, partition orders, rice2, escapes, wasted
    bits) — every stream must decode bit-exactly, in one batched call."""
    r = np.random.default_rng(4242)
    blobs, xs = [], []
    for _ in range(6):
        bps = int(r.choice([8, 12, 16, 20, 24]))
        ch = int(r.choice([1, 2]))
        frames = int(r.integers(400, 3000))
        bsz = int(r.choice([192, 256, 576, 1024]))
        hi = 1 << (bps - 1 - int(r.integers(0, 3)))
        x = r.integers(-hi, hi, size=(frames, ch)).astype(np.int64)
        if r.integers(0, 2):
            x[: frames // 3] = (x[: frames // 3] >> 4) << 4  # wasted-bits bait
        kinds = []
        for _ in range(int(r.integers(1, 5))):
            k = int(r.integers(0, 4))
            if k == 0:
                kinds.append(dict(kind="fixed", order=int(r.integers(0, 5)),
                                  partition_order=int(r.integers(0, 3)),
                                  method=int(r.integers(0, 2))))
            elif k == 1:
                o = int(r.integers(1, 9))
                coefs = [int(c) for c in r.integers(-2000, 2000, o)]
                if not any(coefs):
                    coefs[0] = 512
                kinds.append(dict(kind="lpc", lpc_coefs=coefs,
                                  lpc_shift=int(r.integers(0, 13))))
            elif k == 2:
                kinds.append(dict(kind="verbatim"))
            else:
                kinds.append(dict(kind="fixed", order=1,
                                  escape_bits=int(r.integers(4, 20))))
        stereo = ("independent" if ch == 1
                  else STEREO_MODES[int(r.integers(0, 4))])
        blobs.append(FW.encode_file(x.astype(np.int32), 44100, bps,
                                    blocksize=bsz, stereo=stereo,
                                    subframe_kw=kinds))
        xs.append(x)
    _check_exact(blobs, xs)


def test_streaminfo_md5_verification(rng):
    """The writer now stamps the spec MD5 (interleaved LE samples);
    decoded output must verify, and a tampered sample must not."""
    for bps in (8, 16, 24):
        hi = 1 << (bps - 1)
        x = _material(rng, frames=600, hi=hi)
        blob = FW.encode_file(x, 44100, bps, blocksize=256)
        an = frontend.analyze(blob)
        assert an.md5 != b"\x00" * 16
        (ints, err), = _device_decode([blob])
        assert err == 0
        assert frontend.verify_md5(an, ints) is True
        bad = ints.copy()
        bad[5, 0] ^= 1
        assert frontend.verify_md5(an, bad) is False


def test_wire_entry_matches_per_array_entry(rng):
    """pack_wire/flac_decode_wire (the two-transfer local route) must be
    value-identical to pack_group/flac_decode_batch (the per-array
    mesh-sharding surface): the wire entry only re-slices the one
    concatenated descriptor tensor back into the same fields."""
    from audio_decoder_tpu.codecs.flac.device import (flac_decode_batch,
                                                      flac_decode_wire)

    blobs = []
    for i, bps in enumerate((16, 16, 24)):
        x = _material(rng, frames=700 + 64 * i, hi=1 << (bps - 1))
        blobs.append(FW.encode_file(x, 44100, bps, blocksize=256,
                                    stereo=STEREO_MODES[i]))
    analyses = [frontend.analyze(b) for b in blobs]
    args_a, st_a = decoder.pack_group(analyses)
    pcm_a, ovf_a = flac_decode_batch(*args_a, **st_a)
    args_w, st_w = decoder.pack_wire(analyses)
    pcm_w, ovf_w = flac_decode_wire(*args_w, **st_w)
    np.testing.assert_array_equal(np.asarray(pcm_a), np.asarray(pcm_w))
    np.testing.assert_array_equal(np.asarray(ovf_a), np.asarray(ovf_w))


def test_pipelined_chunk_plan_bit_exact(rng, monkeypatch):
    """decode_group's pre-walk chunk plan (early h2d + chunk overlap)
    must split at CHUNK_BYTES without changing results: force a tiny
    chunk budget so a 6-file batch spans multiple fused programs, mixed
    with a walk failure inside a pre-shipped chunk (the repack path)."""
    monkeypatch.setattr(decoder, "CHUNK_BYTES", 1 << 14)
    xs, blobs = [], []
    for i in range(6):
        x = _material(rng, frames=900 + 32 * i)
        blobs.append(FW.encode_file(x, 44100, 16, blocksize=256,
                                    stereo=STEREO_MODES[i % 4]))
        xs.append(x)
    bad = bytearray(blobs[3])
    bad[-3] ^= 0x01  # CRC-16 mismatch → walk failure in a shipped chunk
    blobs[3] = bytes(bad)
    assets = [Asset(f"f{i}", f"f{i}", "flac", b)
              for i, b in enumerate(blobs)]
    pieces = decoder.decode_group(assets)
    ok_pieces = [p for p in pieces
                 if int(np.asarray(p[1].err)[0]) == E.ERR_OK]
    assert len(ok_pieces) >= 2  # the tiny budget really split the batch
    res = _device_decode(blobs)
    assert res[3] == (None, E.ERR_INVALID)
    for i in (0, 1, 2, 4, 5):
        np.testing.assert_array_equal(res[i][0], xs[i])
