"""Property/fuzz tests: truncations and corruptions never crash.

SURVEY §4c: the byte-cursor parsers must map malformed input onto the
DecodeError taxonomy (≙ decode_helpers.rs semantics), never onto Python
exceptions or device faults.  The reference itself panics on several of
these (e.g. its sync scan reads past EOF, SURVEY §5 defect 4).
"""

import numpy as np
import pytest

from audio_decoder_tpu.codecs.registry import decode_assets
from audio_decoder_tpu.io.assets import Asset

from . import codec_refs as CR
from .synth import make_aiff, make_wav


def _decode_one(name, ext, data):
    batch = decode_assets([Asset(path=name, name=name, ext=ext, data=data)])
    return batch.file(0)


#: fixture key → asset extension (ADPCM variants live in .wav containers)
_EXT = {"aiff": "aif", "adpcm": "wav", "msadpcm": "wav"}


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(99)
    pcm = np.clip(rng.standard_normal((2048, 2)) * 8000, -32768, 32767).astype(
        np.int16
    )
    out = {
        "wav": make_wav(pcm, 44100),
        "aiff": make_aiff(pcm, 44100),
        "adpcm": _ima_blob(pcm),
        "msadpcm": _ms_blob_fuzz(pcm),
    }
    if CR.have_lame():
        out["mp3"] = CR.lame_encode(pcm, 44100, 128, mode=1)
    from . import flac_writer as FW

    out["flac"] = FW.encode_file(
        pcm.astype(np.int32), 44100, 16, blocksize=256, stereo="mid_side",
        subframe_kw=[dict(kind="fixed", order=2), dict(kind="lpc",
        lpc_coefs=[1228, -819, 410], lpc_shift=10), dict(kind="verbatim")])
    return out


def _ima_blob(pcm) -> bytes:
    import struct

    from . import ima_ref as IR

    ba, ch = 256, pcm.shape[1]
    spb = 1 + 8 * ((ba - 4 * ch) // (4 * ch))
    return make_wav(np.zeros((0, ch), np.int16), 44100, 4,
                    fmt_code_override=0x11, data_override=IR.encode(pcm, ba),
                    block_align_override=ba,
                    fmt_tail=struct.pack("<HH", 2, spb))


def _ms_blob_fuzz(pcm) -> bytes:
    import struct

    from . import ms_ref as MR

    ba, ch = 256, pcm.shape[1]
    spb = 2 + (ba - 7 * ch) * 2 // ch
    return make_wav(np.zeros((0, ch), np.int16), 44100, 4,
                    fmt_code_override=0x02, data_override=MR.encode(pcm, ba),
                    block_align_override=ba,
                    fmt_tail=struct.pack("<HH", 2, spb))


@pytest.mark.parametrize(
    "ext", ["wav", "aiff", "mp3", "adpcm", "msadpcm", "flac"])
def test_truncations_never_crash(blobs, ext):
    if ext not in blobs:
        pytest.skip("lame unavailable")
    blob = blobs[ext]
    rng = np.random.default_rng(5)
    cuts = sorted(set(
        [0, 1, 2, 3, 4, 7, 8, 11, 12, 40, 43, 44, 45, 100]
        + list(rng.integers(0, len(blob), 12))
    ))
    for cut in cuts:
        f = _decode_one("t", _EXT.get(ext, ext), blob[:cut])
        # either a clean per-file error code or a valid (possibly shorter)
        # decode — never an exception
        assert f.err in (0, 1, 2, 3, 4)
        if f.err == 0:
            assert f.pcm.shape[0] >= 0


@pytest.mark.parametrize(
    "ext", ["wav", "aiff", "mp3", "adpcm", "msadpcm", "flac"])
def test_byte_corruptions_never_crash(blobs, ext):
    if ext not in blobs:
        pytest.skip("lame unavailable")
    blob = bytearray(blobs[ext])
    rng = np.random.default_rng(17)
    for _ in range(16):
        i = int(rng.integers(0, len(blob)))
        mut = bytearray(blob)
        mut[i] ^= int(rng.integers(1, 256))
        f = _decode_one("c", _EXT.get(ext, ext), bytes(mut))
        assert f.err in (0, 1, 2, 3, 4)


def test_empty_and_tiny_inputs():
    for ext in ("wav", "aif", "mp3", "flac"):
        for data in (b"", b"\x00", b"RIFF", b"FORM\x00\x00"):
            f = _decode_one("e", ext, data)
            assert f.err != 0


def test_wav_garbage_chunks_skipped():
    """Unknown chunks before data must be walked over (RIFF semantics)."""
    import struct

    rng = np.random.default_rng(3)
    pcm = np.clip(rng.standard_normal((256, 1)) * 8000, -32768, 32767).astype(
        np.int16
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"JUNK" + struct.pack("<I", 10) + b"0123456789"
    data = pcm.tobytes()
    body = (b"WAVE" + junk + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + junk + b"data" + struct.pack("<I", len(data)) + data)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    f = _decode_one("j", "wav", blob)
    assert f.err == 0
    np.testing.assert_array_equal(
        np.round(f.pcm * 32768.0).astype(np.int16), pcm
    )


def test_id3v2_tag_skipped():
    """A leading ID3v2 tag (with sync-like payload bytes) must not derail
    frame discovery."""
    if not (CR.have_lame() and CR.have_mpg123()):
        pytest.skip("lame unavailable")
    rng = np.random.default_rng(31)
    s = 0.3 * rng.standard_normal(11025)
    pcm = np.clip(np.stack([s, s], 1) * 30000, -32768, 32767).astype(np.int16)
    blob = CR.lame_encode(pcm, 44100, 128, mode=1)
    payload = b"\xff\xfb\x90\x00" * 64  # fake syncs inside the tag
    size = len(payload)
    tag = (b"ID3\x04\x00\x00"
           + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
           + payload)
    from . import mp3_oracle as MO
    ref, _ = MO.decode(blob)
    f = _decode_one("id3", "mp3", tag + blob)
    assert f.err == 0
    n = min(len(ref), f.pcm.shape[0])
    rms = float(np.sqrt(((ref[:n] - f.pcm[:n]) ** 2).mean()))
    assert rms < 5e-7


def test_vbr_stream_with_xing_tag():
    """VBR streams (per-frame bitrates) decode; a leading Xing tag frame
    carries no audio and must be dropped, like mpg123 does."""
    import ctypes as Ct
    if not (CR.have_lame() and CR.have_mpg123()):
        pytest.skip("lame unavailable")
    L = Ct.CDLL("libmp3lame.so.0")
    L.lame_init.restype = Ct.c_void_p
    gfp = Ct.c_void_p(L.lame_init())
    rng = np.random.default_rng(3)
    s = 0.3 * rng.standard_normal(44100)
    pcm = np.clip(np.stack([s, np.roll(s, 7) * 0.8], 1) * 30000,
                  -32768, 32767).astype(np.int16)
    L.lame_set_num_channels(gfp, 2)
    L.lame_set_in_samplerate(gfp, 44100)
    L.lame_set_VBR(gfp, 4)
    L.lame_set_VBR_q(gfp, 4)
    L.lame_set_bWriteVbrTag(gfp, 0)
    L.lame_init_params(gfp)
    out = np.zeros(44100 * 4 + 16384, np.uint8)
    n = L.lame_encode_buffer_interleaved(
        gfp, pcm.ctypes.data_as(Ct.POINTER(Ct.c_short)), 44100,
        out.ctypes.data_as(Ct.POINTER(Ct.c_ubyte)), len(out))
    n2 = L.lame_encode_flush(
        gfp, out[n:].ctypes.data_as(Ct.POINTER(Ct.c_ubyte)), len(out) - n)
    blob = bytes(out[: n + n2])
    from . import mp3_oracle as MO
    bitrates = {h["bitrate"] for _, h in MO.find_frames(blob)}
    assert len(bitrates) > 1  # genuinely VBR

    # synthesize a leading Xing frame (valid stereo 128k header + marker)
    import struct
    hdr = struct.pack(">I", (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
                      | (9 << 12) | (0 << 10) | (1 << 6))
    frame_len = 144 * 128000 // 44100
    xing = bytearray(hdr) + bytearray(frame_len - 4)
    xing[4 + 32 : 4 + 36] = b"Xing"
    tagged = bytes(xing) + blob

    ref, _ = CR.mpg123_decode(tagged)
    f = _decode_one("vbr", "mp3", tagged)
    assert f.err == 0
    n = min(len(ref), f.pcm.shape[0])
    rms = float(np.sqrt(((ref[:n] - f.pcm[:n]) ** 2).mean()))
    assert rms < 5e-7, f"rms {rms}"


def test_free_format_bitrate():
    """Free-format streams (bitrate_index 0, nonstandard constant rate):
    frame length measured from sync spacing, padding tracked per frame."""
    import ctypes as Ct
    if not (CR.have_lame() and CR.have_mpg123()):
        pytest.skip("lame unavailable")
    L = Ct.CDLL("libmp3lame.so.0")
    L.lame_init.restype = Ct.c_void_p
    gfp = Ct.c_void_p(L.lame_init())
    rng = np.random.default_rng(3)
    s = 0.3 * rng.standard_normal(22050)
    pcm = np.clip(np.stack([s, np.roll(s, 7) * 0.8], 1) * 30000,
                  -32768, 32767).astype(np.int16)
    L.lame_set_num_channels(gfp, 2)
    L.lame_set_in_samplerate(gfp, 44100)
    L.lame_set_brate(gfp, 150)  # nonstandard → free format
    L.lame_set_free_format(gfp, 1)
    L.lame_set_bWriteVbrTag(gfp, 0)
    assert L.lame_init_params(gfp) >= 0
    out = np.zeros(800000, np.uint8)
    n = L.lame_encode_buffer_interleaved(
        gfp, pcm.ctypes.data_as(Ct.POINTER(Ct.c_short)), len(pcm),
        out.ctypes.data_as(Ct.POINTER(Ct.c_ubyte)), len(out))
    n2 = L.lame_encode_flush(
        gfp, out[n:].ctypes.data_as(Ct.POINTER(Ct.c_ubyte)), len(out) - n)
    blob = bytes(out[: n + n2])
    ref, _ = CR.mpg123_decode(blob)
    f = _decode_one("ff", "mp3", blob)
    assert f.err == 0
    m = min(len(ref), f.pcm.shape[0])
    rms = float(np.sqrt(((ref[:m] - f.pcm[:m]) ** 2).mean()))
    assert rms < 5e-7, f"rms {rms}"


def test_lsf_intensity_random_streams_never_crash():
    """Random LSF joint-stereo frames (arbitrary scalefac_compress, random
    scalefactor values, random spectra) decode to finite PCM or a per-file
    error — never a crash.  Exercises the is_pos layout reader across all
    three category ranges."""
    from .mp3_writer import make_l3_frame

    rng = np.random.default_rng(7)
    for trial in range(24):
        sc = int(rng.integers(0, 512))
        mode_ext = int(rng.integers(1, 4))
        bt = int(rng.choice([0, 2]))
        nsf = 36 if bt == 2 else 21
        sfs = rng.integers(0, 8, nsf).tolist()
        vals = rng.integers(-1, 2, 2 * int(rng.integers(0, 60))).astype(
            np.int32
        )
        blob = make_l3_frame(
            sr=22050, mode=1, mode_ext=mode_ext,
            spectra=(vals, ()), scalefac=((), sfs),
            scalefac_compress=(0, sc), global_gain=(240, 200),
            block_type=(bt, bt),
        ) * 4
        f = _decode_one(f"lsf{trial}", "mp3", blob)
        assert np.isfinite(np.asarray(f.pcm)).all() or f.err != 0


def test_crc_protected_frames():
    """Protected frames decode identically (the CRC bytes are skipped,
    matching the reference and mpg123), and crc_check verifies them:
    True on intact frames, False after side-info corruption."""
    from audio_decoder_tpu.codecs.mpeg.frontend import crc_check, find_frames
    from .mp3_writer import make_l3_frame

    vals = np.asarray([1, -1] * 12, np.int32)
    kw = dict(sr=44100, mode=3, mode_ext=0, spectra=(vals,),
              scalefac=((),), scalefac_compress=(0,), global_gain=(240,))
    plain = make_l3_frame(**kw) * 6
    prot = make_l3_frame(protect=True, **kw) * 6
    f_plain = _decode_one("p", "mp3", plain)
    f_prot = _decode_one("q", "mp3", prot)
    assert f_prot.err == 0
    n = min(f_plain.pcm.shape[0], f_prot.pcm.shape[0])
    np.testing.assert_array_equal(f_plain.pcm[:n], f_prot.pcm[:n])

    frames = find_frames(prot)
    assert frames and all(h["crc"] for _, h in frames)
    assert all(crc_check(prot, pos, h) for pos, h in frames)
    # corrupt one side-info byte → that frame's CRC fails
    bad = bytearray(prot)
    pos0, h0 = frames[0]
    bad[pos0 + 8] ^= 0xFF
    assert crc_check(bytes(bad), pos0, h0) is False
    # unprotected frames report None
    fp = find_frames(plain)
    assert crc_check(plain, fp[0][0], fp[0][1]) is None


def test_id3v1_trailer_and_aifc_twos():
    """An ID3v1 128-byte 'TAG' trailer after the last MP3 frame decodes
    cleanly (the sync scan must not trip inside it); AIFC 'twos' is an
    explicit big-endian PCM synonym of NONE."""
    from .synth import make_aiff

    if CR.have_lame():
        rng = np.random.default_rng(17)
        pcm = np.clip(rng.standard_normal((4410, 2)) * 8000,
                      -32768, 32767).astype(np.int16)
        mp3 = CR.lame_encode(pcm, 44100, 128, mode=1)
        tag = b"TAG" + b"A" * 125
        f_plain = _decode_one("p", "mp3", mp3)
        f_tag = _decode_one("t", "mp3", mp3 + tag)
        assert f_tag.err == 0
        n = min(f_plain.pcm.shape[0], f_tag.pcm.shape[0])
        np.testing.assert_array_equal(f_plain.pcm[:n], f_tag.pcm[:n])

    rng = np.random.default_rng(18)
    pcm = np.clip(rng.standard_normal((300, 1)) * 8000,
                  -32768, 32767).astype(np.int16)
    ref = _decode_one("a", "aiff", make_aiff(pcm, 44100))
    two = _decode_one("b", "aiff", make_aiff(pcm, 44100, compression=b"twos"))
    assert two.err == 0
    np.testing.assert_array_equal(np.asarray(ref.pcm), np.asarray(two.pcm))


def test_native_python_frontend_agreement_on_corrupt_streams():
    """The C++ and Python lane emitters must agree on which granules are
    decodable even for corrupt input: a lane the native path keeps that
    Python rejects would decode garbage the reference front-end treats
    as invalid (the BitReader zero-fill vs IndexError divergence, fixed
    by the overrun check in mp3fe.cc)."""
    from audio_decoder_tpu.codecs.mpeg import frontend as FE
    from audio_decoder_tpu.codecs.mpeg import native as NA

    if not (CR.have_lame() and NA.available()):
        pytest.skip("lame or native front-end unavailable")
    rng = np.random.default_rng(23)
    s = 0.3 * rng.standard_normal(6000)
    pcm = np.clip(np.stack([s, np.roll(s, 5)], 1) * 30000, -32768, 32767).astype(
        np.int16
    )
    blob = bytearray(CR.lame_encode(pcm, 44100, 128, mode=1))
    for trial in range(24):
        mut = bytearray(blob)
        if trial % 2 == 0:
            mut = mut[: int(rng.integers(64, len(mut)))]  # truncate
        else:
            for _ in range(int(rng.integers(1, 4))):
                i = int(rng.integers(0, len(mut)))
                mut[i] ^= int(rng.integers(1, 256))
        data = bytes(mut)
        try:
            ln = FE.analyze_lanes(data)
            py_ok = True
        except Exception:
            py_ok = False
        info = NA.probe(data)
        if not py_ok:
            # Python rejects the whole file; native may still frame it,
            # but must not claim MORE decodable granules than a framing
            # pass supports — just require it not to crash and that any
            # per-lane validity is self-consistent (checked below when
            # both succeed).
            continue
        if info["err"] != 0:
            continue  # native rejects outright: strictly safer
        g_cap = 1
        while g_cap < max(ln.n_granules, 1):
            g_cap *= 2
        m_cap = 1024
        while m_cap < max(len(ln.main_data), 1):
            m_cap *= 2
        r = NA.lanes_batch([data], g_cap, m_cap, ln.channels)
        nat_valid = r["valid"][0, : ln.n_granules].reshape(-1)
        py_valid = np.asarray(ln.valid).reshape(-1)
        np.testing.assert_array_equal(
            nat_valid.astype(bool), py_valid.astype(bool),
            err_msg=f"valid-mask divergence on trial {trial}",
        )


def test_trailing_tags_bound_the_frame_walk():
    """Trailing ID3v1 / Enhanced TAG+ / APEv2 / Lyrics3v2 tags are
    stripped before the sync walk (frontend.scan_end, mirrored in
    mp3fe.cc): a crafted VALID low-bitrate frame planted inside a tag
    payload must not append a garbage frame.  The benign-trailer case is
    test_id3v1_trailer_and_aifc_twos; this is the hostile one (tag text
    is free-form, and 8 kbps MPEG-2.5 frames are only 52 bytes — they
    fit inside a 128-byte ID3v1 comment)."""
    import struct

    from audio_decoder_tpu.codecs.mpeg import frontend as FE
    from audio_decoder_tpu.codecs.mpeg import native as NA

    if not CR.have_lame():
        pytest.skip("lame unavailable")
    rng = np.random.default_rng(23)
    pcm = np.clip(rng.standard_normal((4410, 2)) * 8000,
                  -32768, 32767).astype(np.int16)
    blob = CR.lame_encode(pcm, 44100, 128, mode=1)
    frames0 = FE.find_frames(blob)
    assert frames0

    # a fully valid 8 kbps MPEG-2.5 Layer III header: 52-byte frames
    hostile = b"\xff\xe3\x10\x00" + bytes(60)
    assert FE.parse_header(int.from_bytes(hostile[:4], "big"))["frame_len"] == 52
    id3v1 = (b"TAG" + hostile + bytes(125))[:128]
    tagplus = (b"TAG+" + hostile + bytes(250))[:227]
    size = len(hostile) + 32
    footer = (b"APETAGEX" + struct.pack("<III", 2000, size, 1)
              + struct.pack("<I", 0x80000000) + bytes(8))
    header = (b"APETAGEX" + struct.pack("<III", 2000, size, 1)
              + struct.pack("<I", 0xA0000000) + bytes(8))
    ape = header + hostile + footer
    ly_body = b"LYRICSBEGIN" + hostile
    lyrics = ly_body + (b"%06d" % len(ly_body)) + b"LYRICS200"

    combos = {
        "id3v1": id3v1,
        "tag+": tagplus + id3v1,
        "ape": ape,
        "ape+id3v1": ape + id3v1,
        "lyrics3+id3v1": lyrics + id3v1,
        "ape+lyrics3+id3v1": ape + lyrics + id3v1,
    }
    ref = _decode_one("p", "mp3", blob)
    for label, tail in combos.items():
        tagged = blob + tail
        assert FE.find_frames(tagged) == frames0, label
        f = _decode_one(label, "mp3", tagged)
        assert f.err == 0, label
        assert f.pcm.shape[0] == ref.pcm.shape[0], label
        np.testing.assert_array_equal(
            np.asarray(f.pcm), np.asarray(ref.pcm), err_msg=label)
        if NA.available():  # C++ front-end strips the same bytes
            assert (NA.probe(tagged)["n_granules"]
                    == NA.probe(blob)["n_granules"]), label

    # a blob that is ONLY tags has no frames (clean error, no crash)
    f = _decode_one("only", "mp3", ape + lyrics + id3v1)
    assert f.err != 0


def test_flac_native_python_walk_agreement_on_corrupt_streams():
    """Differential fuzz of the native FLAC session walker (the MPEG
    pattern above, ported): random truncations and bit-flips over
    mixed-feature streams must leave the C walk and the pure-Python walk
    in agreement on (analysis fields | error code).  The dangerous
    direction is native-accepts/Python-rejects — the walker would feed
    the device program garbage the behavioral contract calls invalid;
    the reverse (native declines, Python decodes) is the designed
    fallback and only costs speed."""
    from audio_decoder_tpu.codecs.flac import frontend as FF
    from audio_decoder_tpu.codecs.flac import native as FN
    from audio_decoder_tpu.core import errors as E
    from .flac_writer import encode_file
    from .test_flac_oracle import SUBFRAME_CASES, _material

    if not FN.available():
        pytest.skip("native flacfe unavailable")
    rng = np.random.default_rng(29)
    kinds = [kw for _, kw in SUBFRAME_CASES]
    x = _material(rng, frames=2400)
    base = encode_file(x, 44100, 16, blocksize=256, stereo="mid_side",
                       subframe_kw=kinds)
    offs = np.asarray(FF.analyze(base).byte_offs)

    def py_walk(data):
        try:
            return FF._analyze_py(data)
        except E.DecodeError as e:
            return e

    fields = ("blocksizes", "starts", "ch_mode", "sub_kind", "sub_order",
              "sub_shift", "sub_wasted", "sub_coeffs", "rl_sub",
              "rl_bitpos", "rl_count", "rl_param", "rl_dest", "fw_sub",
              "fw_bitpos", "fw_count", "fw_width", "fw_dest", "dv_sub",
              "dv_dest", "dv_val")
    # the pure tier: strip the native micro-kernels so py_walk really is
    # the independent implementation, not C-accelerated Python
    import unittest.mock as mock
    patches = [mock.patch.object(FF._native, n, lambda *a, **k: None)
               for n in ("skip_rice", "crc8", "crc16")]
    for p in patches:
        p.start()
    try:
        fs = FF.parse_streaminfo(base)["frames_start"]
        deep = 0
        for trial in range(96):
            mut = bytearray(base)
            mode = trial % 3
            if mode == 0:
                # truncate INSIDE the frame region so the walk itself
                # (not the metadata parse) hits the edge
                mut = mut[: int(rng.integers(fs + 1, len(mut)))]
            elif mode == 1:
                for _ in range(int(rng.integers(1, 4))):
                    i = int(rng.integers(fs, len(mut)))
                    mut[i] ^= int(rng.integers(1, 256))
            else:
                # CRC-FIXED flip: corrupt a frame body, then restore
                # that frame's CRC-16 — the only mutations that get past
                # the checksum wall and into the deep walk (subframe
                # headers, rice params, residual layout), where a C/
                # Python divergence would actually mis-decode
                f = int(rng.integers(0, len(offs) - 1))
                a, b = int(offs[f]), int(offs[f + 1])
                i = int(rng.integers(a + 4, b - 2))
                mut[i] ^= int(rng.integers(1, 256))
                c = FF.crc16(bytes(mut[a:b - 2]))
                mut[b - 2], mut[b - 1] = c >> 8, c & 0xFF
            data = bytes(mut)
            res = FN.walk_batch([data], FF.Q_CAP, FF.RICE_SPLIT,
                                FF.MAX_BPS, 1 << 62)[0]
            py = py_walk(data)
            if isinstance(res, int):
                # native rejected: Python (re-walked by analyze_batch)
                # stays authoritative; when Python also rejects, the
                # codes must agree so downstream routing is identical
                if isinstance(py, E.DecodeError):
                    assert res == py.code, (
                        f"trial {trial}: native code {res} vs Python "
                        f"{type(py).__name__} ({py.code})")
                continue
            assert not isinstance(py, E.DecodeError), (
                f"trial {trial}: native walked a stream the Python "
                f"contract rejects with {type(py).__name__}")
            deep += 1
            an = FF._from_walk(data, res)
            for f in fields:
                np.testing.assert_array_equal(
                    getattr(an, f), getattr(py, f),
                    err_msg=f"trial {trial}: {f}")
            assert (an.channels, an.bits, an.total, an.md5) == (
                py.channels, py.bits, py.total, py.md5), trial
        assert deep >= 16  # the sweep really reached the deep walk
    finally:
        for p in patches:
            p.stop()
