"""26-32-bit FLAC — the host decode route (codecs/flac/host.py).

RFC 9639 allows sample sizes to 32 bits; the fused device program is
i32/f32-exact only through 25, so decode_group routes wider streams to
the host decoder (native ``flacfe_decode`` with int64 predictors, or
the pure-numpy tier).  Pinned here:

  * native / pure-Python / clear-room (tests/flac_ref.py) agreement on
    the exact integers, across subframe kinds and stereo modes;
  * libavcodec agreement at 26/28 bits (avcodec 59 predates 32-bit
    FLAC, so the 32-bit rows rest on the other three implementations);
  * the decode_group route: no UnsupportedFormatError for any legal
    stream, nearest-f32 PCM with correct metadata, mixed-batch order;
  * the >BIT_CAP chunked route equals the one-shot decode bit-for-bit.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from audio_decoder_tpu.codecs.flac import frontend, host
from audio_decoder_tpu.codecs.flac import decoder as flac_decoder
from audio_decoder_tpu.core import errors as E

from . import flac_ref as FR
from . import flac_writer as FW
from .codec_refs import have_ffdec


def _wide(rng, S, bits, C=2):
    hi = 2 ** (bits - 1)
    t = np.arange(S) / 44100.0
    m = (np.sin(2 * np.pi * 220.0 * t) * 0.5
         + np.sin(2 * np.pi * 333.3 * t) * 0.2
         + 0.01 * rng.standard_normal(S)) * hi * 0.8
    cols = [m, np.roll(m, 5) * 0.9][:C]
    return np.clip(np.round(np.stack(cols, 1)), -hi, hi - 1).astype(np.int64)


@dataclasses.dataclass
class _Asset:
    name: str
    data: bytes


KINDS = [dict(kind="fixed", order=2),
         dict(kind="lpc", lpc_coefs=[900, -300], lpc_shift=9),
         dict(kind="constant"), dict(kind="verbatim")]


@pytest.mark.parametrize("bits,stereo", [
    (26, "left_side"), (28, "right_side"), (32, "mid_side"),
    (32, "independent"),
])
def test_host_decode_oracles(rng, bits, stereo):
    x = _wide(rng, 2100, bits)
    x[:256] = x[0]  # a constant stretch
    blob = FW.encode_file(x, 44100, bits, blocksize=256, stereo=stereo,
                          subframe_kw=KINDS)
    ints, info = host.decode_ints(blob)
    assert (info["rate"], info["channels"], info["bits"]) == (44100, 2, bits)
    np.testing.assert_array_equal(ints.astype(np.int64), x)
    ref, _ = FR.decode_file(blob)
    np.testing.assert_array_equal(ref, x)
    ints_py, info_py = host._decode_py(blob)
    np.testing.assert_array_equal(ints_py.astype(np.int64), x)
    assert info_py["bits"] == bits
    if bits <= 28 and have_ffdec():
        from .codec_refs import ffdec_decode_flac

        fv, fr = ffdec_decode_flac(blob, bits)
        np.testing.assert_array_equal(fv.astype(np.int64), x)
        assert fr == 44100


def test_host_decode_mono_32(rng):
    x = _wide(rng, 1500, 32, C=1)
    blob = FW.encode_file(x, 96000, 32, blocksize=512)
    ints, info = host.decode_ints(blob)
    np.testing.assert_array_equal(ints.astype(np.int64), x)
    assert info["rate"] == 96000 and info["channels"] == 1


def test_host_matches_device_at_16(rng):
    """On streams the device CAN decode, the host route must agree with
    the fused program sample-for-sample (same walk, two decoders)."""
    from .test_flac_device import _device_decode

    x = _wide(rng, 3000, 16)
    blob = FW.encode_file(x, 44100, 16, blocksize=512, stereo="mid_side",
                          subframe_kw=KINDS)
    ints, _ = host.decode_ints(blob)
    np.testing.assert_array_equal(ints.astype(np.int64), x)
    (dev_ints, err), = _device_decode([blob])
    assert err == 0
    np.testing.assert_array_equal(dev_ints, x)


def test_host_error_taxonomy(rng):
    x = _wide(rng, 900, 32)
    blob = FW.encode_file(x, 44100, 32, blocksize=448)
    for tier in (host.decode_ints, host._decode_py):
        with pytest.raises(E.DecodeError):
            tier(blob[: len(blob) * 2 // 3])
        bad = bytearray(blob)
        bad[-30] ^= 0x04
        with pytest.raises(E.InvalidDataError):
            tier(bytes(bad))


def test_decode_group_routes_wide_streams(rng):
    """A mixed batch: 16-bit files ride the device, a 32-bit file rides
    the host — every file decodes (no UnsupportedFormatError), order and
    metadata intact, f32 = nearest float of the exact integers."""
    x16 = _wide(rng, 1800, 16)
    x32 = _wide(rng, 1700, 32)
    b16 = FW.encode_file(x16, 44100, 16, blocksize=512)
    b32 = FW.encode_file(x32, 48000, 32, blocksize=512, stereo="mid_side")
    assets = [_Asset("a16", b16), _Asset("w32", b32), _Asset("b16", b16)]
    pieces = flac_decoder.decode_group(assets)
    got = {}
    for idxs, batch in pieces:
        err = np.asarray(batch.err)
        for k, i in enumerate(idxs):
            assert int(err[k]) == 0, assets[i].name
            got[i] = (batch, k)
    assert set(got) == {0, 1, 2}
    batch, k = got[1]
    assert int(np.asarray(batch.bits_per_sample)[k]) == 32
    assert int(np.asarray(batch.sample_rate)[k]) == 48000
    n = int(np.asarray(batch.valid_frames)[k])
    pcm = np.asarray(batch.data)[k].reshape(-1, 2)[:n]
    want = (x32.astype(np.float64) * 2.0 ** -31).astype(np.float32)
    np.testing.assert_array_equal(pcm, want)
    # and the 16-bit companions still decode exactly
    for i in (0, 2):
        batch, k = got[i]
        n = int(np.asarray(batch.valid_frames)[k])
        pcm = np.asarray(batch.data)[k].reshape(-1, 2)[:n]
        np.testing.assert_array_equal(
            np.round(pcm.astype(np.float64) * 2.0 ** 15).astype(np.int64),
            x16)


def test_decode_group_chunked_big_file(rng, monkeypatch):
    """Files past BIT_CAP route through the frame-chunked path and must
    equal the one-shot decode bit-for-bit (cap shrunk for the test)."""
    x = _wide(rng, 6000, 16)
    blob = FW.encode_file(x, 44100, 16, blocksize=512)
    one = flac_decoder.decode_group([_Asset("f", blob)])
    (idxs1, b1), = one
    monkeypatch.setattr(frontend, "BIT_CAP", 4096)
    assert len(blob) * 8 >= 4096
    (idxs2, b2), = flac_decoder.decode_group([_Asset("f", blob)])
    assert int(np.asarray(b2.err)[0]) == 0
    n1 = int(np.asarray(b1.valid_frames)[0])
    n2 = int(np.asarray(b2.valid_frames)[0])
    assert n1 == n2 == 6000
    p1 = np.asarray(b1.data)[0].reshape(-1, 2)[:n1]
    p2 = np.asarray(b2.data)[0].reshape(-1, 2)[:n2]
    np.testing.assert_array_equal(p1, p2)


def test_pack_group_guards_bit_cap(rng, monkeypatch):
    """pack_group must refuse (not silently truncate) an analysis whose
    positions exceed the device's int32 lanes."""
    x = _wide(rng, 1200, 16)
    blob = FW.encode_file(x, 44100, 16, blocksize=512)
    an = frontend.analyze(blob)
    big = dataclasses.replace(an, data=an.data + bytes((1 << 28) - len(an.data)))
    with pytest.raises(E.UnsupportedFormatError):
        flac_decoder.pack_group([big])


def test_pack_group_keys_on_actual_size_not_bucket(rng, monkeypatch):
    """A group whose ACTUAL packed size fits int32 bit positions must
    pack even when _bucket_fine rounds the byte tensor past the cap
    (the real-scale repro: a 240-256 MiB group buckets to 2^28 bytes).
    The guard keys on the unbucketed sum; device.py clamps its static
    limit arithmetic separately."""
    x = _wide(rng, 1200, 16)
    blob = FW.encode_file(x, 44100, 16, blocksize=512)
    an = frontend.analyze(blob)
    analyses = [an, an, an]
    actual = sum(flac_decoder._aligned_size(len(a.data))
                 for a in analyses) + 4
    sz = flac_decoder.sizing_for(analyses)
    if sz["ntot"] == actual:  # dodge an exact bucket step
        analyses = analyses + [dataclasses.replace(
            an, data=an.data + bytes(36))]
        actual = sum(flac_decoder._aligned_size(len(a.data))
                     for a in analyses) + 4
        sz = flac_decoder.sizing_for(analyses)
    assert sz["ntot"] > actual
    monkeypatch.setattr(flac_decoder, "POS_CAP", actual * 8 + 8)
    assert sz["ntot"] * 8 >= flac_decoder.POS_CAP  # bucket alone trips it
    args, statics = flac_decoder.pack_group(analyses)  # must not raise
    assert int(args[0].shape[0]) == sz["ntot"]


def test_decode_group_file_at_cap_edge_routes_chunked(rng, monkeypatch):
    """A file a few bytes under BIT_CAP (len*8 < cap but word alignment
    + the +4 fold tail reach it) must take the frame-chunked route, not
    the fused route where pack_group would raise — and decode equal to
    the one-shot result."""
    x = _wide(rng, 6000, 16)
    blob = FW.encode_file(x, 44100, 16, blocksize=512)
    (_, b1), = flac_decoder.decode_group([_Asset("f", blob)])
    aligned = flac_decoder._aligned_size(len(blob))
    monkeypatch.setattr(frontend, "BIT_CAP", (aligned + 4) * 8)
    # with the physical cap shrunk alongside, the old admission (len*8
    # vs BIT_CAP alone) sent this file into the fused route, where
    # pack_group's guard raised uncaught
    monkeypatch.setattr(flac_decoder, "POS_CAP", (aligned + 4) * 8)
    assert len(blob) * 8 < frontend.BIT_CAP
    (idxs, b2), = flac_decoder.decode_group([_Asset("f", blob)])
    assert idxs == [0]
    assert int(np.asarray(b2.err)[0]) == 0
    n1 = int(np.asarray(b1.valid_frames)[0])
    n2 = int(np.asarray(b2.valid_frames)[0])
    assert n1 == n2 == 6000
    np.testing.assert_array_equal(
        np.asarray(b1.data)[0].reshape(-1, 2)[:n1],
        np.asarray(b2.data)[0].reshape(-1, 2)[:n2])


def test_chunked_route_bad_chunk_fails_per_file(rng, monkeypatch):
    """A device error inside the >BIT_CAP chunked path must become an
    error piece for THAT file (the family catch-and-skip contract), not
    an exception that aborts the whole family decode."""
    x = _wide(rng, 6000, 16)
    blob = FW.encode_file(x, 44100, 16, blocksize=512)
    monkeypatch.setattr(frontend, "BIT_CAP", 4096)

    def bad_batch(analyses, names, sizing=None):
        return flac_decoder._error_batch(names,
                                         [E.ERR_INVALID] * len(names))

    monkeypatch.setattr(flac_decoder, "_decode_batch", bad_batch)
    (idxs, b), = flac_decoder.decode_group([_Asset("f", blob)])
    assert idxs == [0]
    assert int(np.asarray(b.err)[0]) == E.ERR_INVALID


def test_host_unknown_length_compressed_stream(rng):
    """STREAMINFO total == 0 with constant (hugely compressed) frames:
    the native tier's 4:1 output-sizing heuristic undershoots; it must
    grow the buffer and decode — not surface kErrUnsup for a stream the
    pure-Python tier decodes fine (tier-divergent rejection)."""
    S = 441000
    x = np.zeros((S, 2), np.int64)
    blob = bytearray(FW.encode_file(x, 44100, 16, blocksize=4096,
                                    subframe_kw=dict(kind="constant")))
    # zero the 36-bit total_samples field (STREAMINFO bits 108-143 →
    # blob[21] low nibble + blob[22:26])
    blob[21] &= 0xF0
    blob[22:26] = b"\x00\x00\x00\x00"
    blob = bytes(blob)
    assert frontend.parse_streaminfo(blob)["total"] == 0
    assert S > len(blob) * 4 + 65536  # the heuristic cap undershoots
    ints, info = host.decode_ints(blob)
    assert info["total"] == S
    assert info["rate"] == 44100 and info["channels"] == 2
    assert ints.shape == (S, 2)
    assert not ints.any()
    pure, pinfo = host._decode_py(blob)
    assert pinfo["total"] == S
    np.testing.assert_array_equal(ints, pure)
