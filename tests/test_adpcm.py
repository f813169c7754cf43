"""WAV IMA ADPCM (format 0x11): device kernel vs reference oracles.

The device decoder (ops.unpack.unpack_ima_adpcm) must match the
clear-room NumPy reference (tests/ima_ref.py) bit-exactly, and the NumPy
reference itself is cross-checked against libavcodec's adpcm_ima_wav —
two independent implementations, like the MP3 dual-oracle suite.  The
reference decodes no compressed WAV at all (wav.rs:9-28 enumerates
format codes and decodes only PCM); IMA ADPCM is a beyond-reference
capability chosen because its block structure maps onto the TPU the
same way the MP3 Huffman lanes do (sequential within a block, blocks
data-parallel).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from audio_decoder_tpu.codecs.registry import decode_assets
from audio_decoder_tpu.core import errors as E
from audio_decoder_tpu.io.assets import Asset

from . import codec_refs as CR
from . import ima_ref as IR
from .synth import make_wav


def _signal(rng, frames: int, ch: int) -> np.ndarray:
    """Tonal + noise content (exercises both small and large steps)."""
    t = np.arange(frames)
    s = 12000 * np.sin(2 * np.pi * 220 * t / 44100)
    s = s[:, None] * (1.0 - 0.3 * np.arange(ch)[None, :])
    s = s + rng.normal(0, 900, size=(frames, ch))
    return np.clip(s, -32768, 32767).astype(np.int16)


def _spb(ba: int, ch: int) -> int:
    return 1 + 8 * ((ba - 4 * ch) // (4 * ch))


def _blob(data: bytes, ch: int, ba: int, rate: int = 44100,
          fact: int | None = None, extensible: bool = False) -> bytes:
    spb = _spb(ba, ch)
    extra = ([(b"fact", struct.pack("<I", fact))]
             if fact is not None else None)
    if extensible:
        return make_wav(
            np.zeros((0, ch), np.int16), rate, 4, extensible=True,
            fmt_code_override=0x11, data_override=data,
            block_align_override=ba, valid_bits_override=spb,
            extra_chunks=extra)
    return make_wav(
        np.zeros((0, ch), np.int16), rate, 4, fmt_code_override=0x11,
        data_override=data, block_align_override=ba,
        fmt_tail=struct.pack("<HH", 2, spb), extra_chunks=extra)


def _decode_one(data: bytes):
    batch = decode_assets(
        [Asset(path="a.wav", name="a", ext="wav", data=data)])
    return batch.file(0)


@pytest.mark.parametrize("ch,ba", [(1, 256), (2, 256), (2, 2048), (1, 1024)])
def test_ima_device_matches_numpy_oracle(rng, ch, ba):
    pcm = _signal(rng, 3 * _spb(ba, ch) + 7, ch)  # non-block-multiple
    data = IR.encode(pcm, ba)
    f = _decode_one(_blob(data, ch, ba))
    assert f.err == 0 and f.num_channels == ch and f.bits_per_sample == 4
    ref = IR.decode(data, ch, ba)  # padded to whole blocks, like the file
    assert f.pcm.shape[0] == ref.shape[0]
    got = np.asarray(f.pcm)
    np.testing.assert_array_equal(
        np.round(got * 32768.0).astype(np.int16), ref)


def test_ima_fact_chunk_trims_padded_tail(rng):
    ch, ba = 2, 512
    frames = 2 * _spb(ba, ch) + 11
    pcm = _signal(rng, frames, ch)
    data = IR.encode(pcm, ba)
    f = _decode_one(_blob(data, ch, ba, fact=frames))
    assert f.err == 0
    assert f.pcm.shape[0] == frames  # fact wins over block math
    ref = IR.decode(data, ch, ba, n_frames=frames)
    np.testing.assert_array_equal(
        np.round(np.asarray(f.pcm) * 32768.0).astype(np.int16), ref)


def test_ima_extensible_container(rng):
    ch, ba = 2, 256
    pcm = _signal(rng, 2 * _spb(ba, ch), ch)
    data = IR.encode(pcm, ba)
    plain = _decode_one(_blob(data, ch, ba))
    ext = _decode_one(_blob(data, ch, ba, extensible=True))
    assert ext.err == 0
    np.testing.assert_array_equal(np.asarray(ext.pcm), np.asarray(plain.pcm))


def test_ima_partial_tail_block(rng):
    """A truncated final block decodes its complete nibble groups."""
    ch, ba = 2, 256
    pcm = _signal(rng, 2 * _spb(ba, ch), ch)
    data = IR.encode(pcm, ba)
    cut = len(data) - ba + 4 * ch + 2 * (4 * ch)  # header + 2 word groups
    f = _decode_one(_blob(data[:cut], ch, ba))
    assert f.err == 0
    expect = _spb(ba, ch) + 1 + 2 * 8
    assert f.pcm.shape[0] == expect
    ref = IR.decode(data[:cut], ch, ba)
    assert ref.shape[0] == expect
    np.testing.assert_array_equal(
        np.round(np.asarray(f.pcm) * 32768.0).astype(np.int16), ref)


def test_ima_bad_geometry_is_invalid(rng):
    ch, ba = 2, 256
    data = IR.encode(_signal(rng, _spb(ba, ch), ch), ba)
    spb = _spb(ba, ch)
    # wrong wSamplesPerBlock
    blob = make_wav(
        np.zeros((0, ch), np.int16), 44100, 4, fmt_code_override=0x11,
        data_override=data, block_align_override=ba,
        fmt_tail=struct.pack("<HH", 2, spb + 1))
    assert _decode_one(blob).err == E.ERR_INVALID
    # block smaller than the per-channel headers
    blob = make_wav(
        np.zeros((0, ch), np.int16), 44100, 4, fmt_code_override=0x11,
        data_override=data, block_align_override=8,
        fmt_tail=struct.pack("<HH", 2, spb))
    assert _decode_one(blob).err == E.ERR_INVALID
    # wrong coded bit width
    blob = make_wav(
        np.zeros((0, ch), np.int16), 44100, 8, fmt_code_override=0x11,
        data_override=data, block_align_override=ba,
        fmt_tail=struct.pack("<HH", 2, spb))
    assert _decode_one(blob).err == E.ERR_UNSUPPORTED


@pytest.mark.parametrize("ch,ba", [(1, 512), (2, 1024)])
def test_numpy_oracle_close_to_libavcodec(rng, ch, ba):
    """Cross-check vs ffmpeg's independent decoder.

    IMA decoders split into two families: the IMA spec's bit-test
    difference approximation (step>>3 + conditional step/step>>1/step>>2
    — what we, libsndfile and Windows ACM implement) and ffmpeg's exact
    form ((2·n+1)·step >> 3).  Each nibble can differ by the shifts'
    truncated fraction (< 4 units) and the difference feeds back through
    the predictor WITHIN a block, but every block re-syncs exactly at
    its verbatim header sample — so the families agree exactly at block
    heads and within a small tolerance elsewhere (same shape as the MP3
    suite's inter-oracle RMS bound).  Which family is canonical is
    settled by the spec's own pseudocode vectors:
    test_ima_spec_pseudocode_vectors_settle_the_family."""
    if not CR.have_ffdec():
        pytest.skip("libavcodec unavailable")
    spb = _spb(ba, ch)
    pcm = _signal(rng, 4 * spb, ch)
    data = IR.encode(pcm, ba)
    ours = IR.decode(data, ch, ba).astype(np.float32) / 32768.0
    ff = CR.ffdec_decode_adpcm(data, ba, ch)
    assert ff.shape == ours.shape
    np.testing.assert_array_equal(ff[::spb], ours[::spb])  # block heads
    assert float(np.abs(ff - ours).max()) < 2e-3
    assert float(np.sqrt(((ff - ours) ** 2).mean())) < 5e-4


def test_ima_stream_equals_batch_and_seeks(rng):
    from audio_decoder_tpu.codecs.pcm_stream import PcmStream

    ch, ba = 2, 256
    spb = _spb(ba, ch)
    pcm = _signal(rng, 5 * spb, ch)
    blob = _blob(IR.encode(pcm, ba), ch, ba)
    f = _decode_one(blob)
    whole = np.asarray(f.pcm)
    st = PcmStream(blob, frames_per_chunk=2 * spb + 3)
    assert st.total_samples == whole.shape[0]
    got = np.concatenate(list(st))
    np.testing.assert_array_equal(got, whole)
    for s in (1, spb - 1, spb, spb + 1, 3 * spb + 17, st.total_samples):
        parts = list(st.chunks(start_sample=s))
        got = (np.concatenate(parts) if parts
               else np.zeros((0, ch), np.float32))
        np.testing.assert_array_equal(got, whole[s:], err_msg=f"seek {s}")


# ------------------------------------------------- IMA spec arbitration
# The two in-block formula families (see test_numpy_oracle_close_to_
# libavcodec) are settled by the spec itself: the IMA Digital Audio
# Technical Working Group's "Recommended Practices for Enhancing Digital
# Audio Compatibility in Multimedia Systems" rev 3.00 (1992-10-21)
# presents the ADPCM reference decompression algorithm in Section 6.4 as
# explicit pseudocode whose difference reconstruction is the BIT-TEST
# form.  _spec_decode_nibble below is a literal transcription of that
# pseudocode (variable names kept); the vectors it generates are the
# canonical answers.


def _spec_decode_nibble(originalSample: int, predictedSample: int,
                        index: int) -> tuple[int, int]:
    """IMA rev 3.00 §6.4 'ADPCM Decompression' pseudocode, verbatim
    structure: difference = step>>3 (+ step if b2) (+ step>>1 if b1)
    (+ step>>2 if b0), negated on the sign bit, predictor clamped to
    16 bits, index stepped by indexTable and clamped to [0, 88]."""
    stepsize = int(IR.STEPS[index])
    difference = stepsize >> 3
    if originalSample & 4:
        difference += stepsize
    if originalSample & 2:
        difference += stepsize >> 1
    if originalSample & 1:
        difference += stepsize >> 2
    if originalSample & 8:
        predictedSample -= difference
    else:
        predictedSample += difference
    if predictedSample > 32767:
        predictedSample = 32767
    elif predictedSample < -32768:
        predictedSample = -32768
    index += int(IR.INDEX[originalSample & 0xF])
    if index < 0:
        index = 0
    elif index > 88:
        index = 88
    return predictedSample, index


def test_ima_spec_pseudocode_vectors_settle_the_family():
    """Exhaustive spec vectors: every (step index, nibble) transition x a
    predictor sweep, answered by the literal rev 3.00 §6.4 transcription.

    Verdict (VERDICT r2 item 6): our oracle/device family IS the spec's
    reference algorithm — _decode_nibble matches the spec transcription
    on ALL 89x16x5 transitions.  ffmpeg's exact-multiply form
    ((2n+1)·step >> 3) deviates from the spec vectors on 45 of the 89
    step indices (wherever the split shifts truncate more than the
    single >>3 does), so the small in-block tolerance against libavcodec
    is ffmpeg's deviation from the published pseudocode, not ambiguity
    in ours."""
    exact_differs = 0
    for index in range(89):
        step = int(IR.STEPS[index])
        row_differs = False
        for nib in range(16):
            for pred in (-32768, -12345, 0, 777, 32767):
                want = _spec_decode_nibble(nib, pred, index)
                got = IR._decode_nibble(nib, pred, index)
                assert got == want, (index, nib, pred)
            # the other family's magnitude for this (index, nibble)
            mag = nib & 7
            exact = ((2 * mag + 1) * step) >> 3
            spec = ((step >> 3) + (step if mag & 4 else 0)
                    + ((step >> 1) if mag & 2 else 0)
                    + ((step >> 2) if mag & 1 else 0))
            if exact != spec:
                row_differs = True
        exact_differs += bool(row_differs)
    # the families genuinely split (everywhere a shift drops bits), so
    # agreement with the spec vectors is a real arbitration, not vacuous
    assert exact_differs == 45


def test_ima_device_matches_spec_vectors_in_block(rng):
    """A full crafted stream walked nibble-by-nibble with the spec
    pseudocode must equal the DEVICE decode at every in-block position
    (not just block heads) — the end-to-end form of the arbitration."""
    ch, ba = 2, 256
    spb = _spb(ba, ch)
    pcm = _signal(rng, 3 * spb, ch)
    data = IR.encode(pcm, ba)
    f = _decode_one(_blob(data, ch, ba))
    assert f.err == 0
    got = np.round(np.asarray(f.pcm) * 32768.0).astype(np.int64)

    # independent walk: parse blocks and run the spec transcription
    w = (ba - 4 * ch) // (4 * ch)
    out = np.zeros((3 * spb, ch), np.int64)
    at = 0
    for b0 in range(3):
        blk = data[b0 * ba: (b0 + 1) * ba]
        pred, idx = [0] * ch, [0] * ch
        for c in range(ch):
            pred[c] = int.from_bytes(blk[4 * c: 4 * c + 2], "little",
                                     signed=True)
            idx[c] = blk[4 * c + 2]
            out[b0 * spb, c] = pred[c]
        body = blk[4 * ch:]
        nibs = [[] for _ in range(ch)]
        for g in range(w):
            for c in range(ch):
                for k in range(4):
                    byte = body[(g * ch + c) * 4 + k]
                    nibs[c] += [byte & 0xF, byte >> 4]
        for k in range(spb - 1):
            for c in range(ch):
                pred[c], idx[c] = _spec_decode_nibble(
                    nibs[c][k], pred[c], idx[c])
                out[b0 * spb + 1 + k, c] = pred[c]
        at += spb
    np.testing.assert_array_equal(got[: 3 * spb], out)


# ------------------------------------------------------------------ MS ADPCM

from . import ms_ref as MR  # noqa: E402


def _ms_spb(ba: int, ch: int) -> int:
    return 2 + (ba - 7 * ch) * 2 // ch


def _ms_blob(data: bytes, ch: int, ba: int, rate: int = 44100,
             fact: int | None = None) -> bytes:
    extra = ([(b"fact", struct.pack("<I", fact))]
             if fact is not None else None)
    # cbSize=32: wSamplesPerBlock + wNumCoef + the 7 standard pairs
    tail = struct.pack("<HHH", 32, _ms_spb(ba, ch), 7)
    for c1, c2 in zip(MR.COEF1, MR.COEF2):
        tail += struct.pack("<hh", c1, c2)
    return make_wav(
        np.zeros((0, ch), np.int16), rate, 4, fmt_code_override=0x02,
        data_override=data, block_align_override=ba, fmt_tail=tail,
        extra_chunks=extra)


@pytest.mark.parametrize("ch,ba", [(1, 256), (2, 256), (2, 1024)])
def test_ms_device_matches_numpy_oracle(rng, ch, ba):
    pcm = _signal(rng, 3 * _ms_spb(ba, ch) + 5, ch)
    data = MR.encode(pcm, ba)
    f = _decode_one(_ms_blob(data, ch, ba))
    assert f.err == 0 and f.num_channels == ch
    ref = MR.decode(data, ch, ba)
    assert f.pcm.shape[0] == ref.shape[0]
    np.testing.assert_array_equal(
        np.round(np.asarray(f.pcm) * 32768.0).astype(np.int16), ref)


@pytest.mark.parametrize("ch,ba", [(1, 512), (2, 512)])
def test_ms_oracle_matches_libavcodec_exactly(rng, ch, ba):
    """MS ADPCM has ONE decode formula family — ffmpeg matches our
    oracle (and hence the device kernel) bit-exactly, unlike IMA's two
    truncation variants."""
    if not CR.have_ffdec():
        pytest.skip("libavcodec unavailable")
    pcm = _signal(rng, 4 * _ms_spb(ba, ch), ch)
    data = MR.encode(pcm, ba)
    ours = MR.decode(data, ch, ba).astype(np.float32) / 32768.0
    ff = CR.ffdec_decode_adpcm(data, ba, ch, kind="ms")
    assert ff.shape == ours.shape
    np.testing.assert_array_equal(ff, ours)


def test_ms_fact_trim_partial_tail_and_bad_geometry(rng):
    ch, ba = 2, 256
    spb = _ms_spb(ba, ch)
    frames = 2 * spb + 9
    pcm = _signal(rng, frames, ch)
    data = MR.encode(pcm, ba)
    f = _decode_one(_ms_blob(data, ch, ba, fact=frames))
    assert f.err == 0 and f.pcm.shape[0] == frames
    np.testing.assert_array_equal(
        np.round(np.asarray(f.pcm) * 32768.0).astype(np.int16),
        MR.decode(data, ch, ba, n_frames=frames))
    # partial tail: header + 10 code bytes
    cut = len(data) - ba + 7 * ch + 10  # 2 full blocks + header + 10 codes
    f = _decode_one(_ms_blob(data[:cut], ch, ba))
    assert f.err == 0
    assert f.pcm.shape[0] == 2 * spb + 2 + 10 * 2 // ch
    np.testing.assert_array_equal(
        np.round(np.asarray(f.pcm) * 32768.0).astype(np.int16),
        MR.decode(data[:cut], ch, ba))
    # wrong wSamplesPerBlock → invalid
    blob = make_wav(np.zeros((0, ch), np.int16), 44100, 4,
                    fmt_code_override=0x02, data_override=data,
                    block_align_override=ba,
                    fmt_tail=struct.pack("<HH", 2, spb + 1))
    assert _decode_one(blob).err == E.ERR_INVALID


def test_ms_stream_equals_batch_and_seeks(rng):
    from audio_decoder_tpu.codecs.pcm_stream import PcmStream

    ch, ba = 2, 256
    spb = _ms_spb(ba, ch)
    pcm = _signal(rng, 4 * spb, ch)
    blob = _ms_blob(MR.encode(pcm, ba), ch, ba)
    whole = np.asarray(_decode_one(blob).pcm)
    st = PcmStream(blob, frames_per_chunk=spb + 19)
    assert st.total_samples == whole.shape[0]
    np.testing.assert_array_equal(np.concatenate(list(st)), whole)
    for s in (1, spb, 2 * spb + 13, st.total_samples - 1):
        got = np.concatenate(list(st.chunks(start_sample=s)))
        np.testing.assert_array_equal(got, whole[s:], err_msg=f"seek {s}")


# ------------------------------------------------------------ AIFC ima4

from .synth import make_aiff  # noqa: E402


def _ima4_blob(data: bytes, ch: int, frames: int,
               rate: int = 44100) -> bytes:
    return make_aiff(np.zeros((0, ch), np.int16), rate, 16,
                     compression=b"ima4", data_override=data,
                     frames_override=frames)


@pytest.mark.parametrize("ch", [1, 2])
def test_ima4_device_matches_numpy_oracle(rng, ch):
    frames = 5 * 64 + 17  # non-packet-multiple: COMM trims the pad
    pcm = _signal(rng, frames, ch)
    data = IR.encode_ima4(pcm)
    f = _decode_one_aifc(_ima4_blob(data, ch, frames))
    assert f.err == 0 and f.num_channels == ch
    assert f.pcm.shape[0] == frames  # COMM's frame count wins
    ref = IR.decode_ima4(data, ch, n_frames=frames)
    np.testing.assert_array_equal(
        np.round(np.asarray(f.pcm) * 32768.0).astype(np.int16), ref)


def _decode_one_aifc(data: bytes):
    batch = decode_assets(
        [Asset(path="a.aifc", name="a", ext="aifc", data=data)])
    return batch.file(0)


@pytest.mark.parametrize("ch", [1, 2])
def test_ima4_oracle_vs_libavcodec(rng, ch):
    """ffmpeg's adpcm_ima_qt keeps the classic bit-test IMA formula (for
    QuickTime compatibility), so the FIRST packet matches bit-exactly.
    From packet 2 on, ffmpeg/QuickTime carry the running FULL-precision
    predictor across packets while the header stores only its top 9
    bits; we seed every packet from its header — the header's documented
    purpose, what every decoder does on seek, and what makes packets
    independent parallel lanes.  The step INDEX transfers exactly and
    the predictor difference enters linearly (vpdiff never depends on
    the predictor), so the deviation is bounded by the 7 dropped
    predictor bits per packet boundary: |diff| < 128/32768 absent
    clamping (measured 124 max)."""
    if not CR.have_ffdec():
        pytest.skip("libavcodec unavailable")
    pcm = _signal(rng, 6 * 64, ch)
    data = IR.encode_ima4(pcm)
    ours = IR.decode_ima4(data, ch).astype(np.float32) / 32768.0
    ff = CR.ffdec_decode_adpcm(data, 34 * ch, ch, kind="ima_qt")
    assert ff.shape == ours.shape
    np.testing.assert_array_equal(ff[:64], ours[:64])  # first packet
    assert float(np.abs(ff - ours).max()) < 128.0 / 32768.0


def test_ima4_stream_equals_batch_and_seeks(rng):
    from audio_decoder_tpu.codecs.pcm_stream import PcmStream

    ch = 2
    frames = 7 * 64
    pcm = _signal(rng, frames, ch)
    blob = _ima4_blob(IR.encode_ima4(pcm), ch, frames)
    whole = np.asarray(_decode_one_aifc(blob).pcm)
    st = PcmStream(blob, frames_per_chunk=150)
    assert st.total_samples == whole.shape[0]
    np.testing.assert_array_equal(np.concatenate(list(st)), whole)
    for s in (1, 63, 64, 65, 3 * 64 + 7, st.total_samples - 1):
        got = np.concatenate(list(st.chunks(start_sample=s)))
        np.testing.assert_array_equal(got, whole[s:], err_msg=f"seek {s}")


def test_ima_spb_field_absent_derives_from_block_align(rng):
    """A 16-byte fmt chunk (no cbSize/wSamplesPerBlock — some writers)
    derives the per-block sample count instead of being rejected."""
    ch, ba = 2, 256
    pcm = _signal(rng, 2 * _spb(ba, ch), ch)
    data = IR.encode(pcm, ba)
    blob = make_wav(np.zeros((0, ch), np.int16), 44100, 4,
                    fmt_code_override=0x11, data_override=data,
                    block_align_override=ba)  # NO fmt_tail: bare 16 bytes
    f = _decode_one(blob)
    assert f.err == 0
    np.testing.assert_array_equal(
        np.round(np.asarray(f.pcm) * 32768.0).astype(np.int16),
        IR.decode(data, ch, ba))
    from audio_decoder_tpu.codecs.pcm_stream import parse_wav_header
    host = parse_wav_header(np.frombuffer(blob, np.uint8))
    assert host["n_frames"] == f.pcm.shape[0]


def test_adpcm_seek_to_eof_yields_no_phantom_chunk(rng):
    """Seeking exactly to total_samples at a non-block-aligned position
    must yield nothing (not an empty array)."""
    from audio_decoder_tpu.codecs.pcm_stream import PcmStream

    ch, ba = 2, 256
    frames = 2 * _spb(ba, ch) + 9  # fact-trimmed: EOF mid-block
    data = IR.encode(_signal(rng, frames, ch), ba)
    st = PcmStream(_blob(data, ch, ba, fact=frames), frames_per_chunk=300)
    assert st.total_samples == frames
    assert list(st.chunks(start_sample=frames)) == []
