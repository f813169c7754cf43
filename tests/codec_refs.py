"""ctypes bindings to the system LAME encoder and mpg123 decoder.

Test-only oracles: LAME *produces* real MP3 bitstreams (exercising the bit
reservoir, all Huffman tables, MS stereo, short blocks), and mpg123 is the
independent ground-truth decoder our decoders must match within spec
tolerance (the reference offers no MP3 oracle — its decode is a TODO,
blast/src/main.rs:44-54).
"""

from __future__ import annotations

import ctypes as C

import numpy as np

_lame = None
_mpg = None


def have_lame() -> bool:
    global _lame
    if _lame is None:
        try:
            _lame = C.CDLL("libmp3lame.so.0")
        except OSError:
            _lame = False
    return bool(_lame)


def have_mpg123() -> bool:
    global _mpg
    if _mpg is None:
        try:
            _mpg = C.CDLL("libmpg123.so.0")
            _mpg.mpg123_init()
        except OSError:
            _mpg = False
    return bool(_mpg)


def lame_encode(
    pcm: np.ndarray,
    sample_rate: int = 44100,
    bitrate: int = 128,
    mode: int | None = None,
    quality: int = 5,
    disable_reservoir: bool = False,
    write_vbr_tag: bool = False,
) -> bytes:
    """Encode [frames, channels] int16 PCM → MP3 bytes.

    mode: 0=stereo, 1=joint stereo, 3=mono (defaults by channel count).
    write_vbr_tag=True emits a real Xing/LAME info frame (patched in
    post-flush via lame_get_lametag_frame) carrying the encoder
    delay/padding for gapless decode."""
    assert have_lame()
    L = _lame
    L.lame_init.restype = C.c_void_p
    gfp = C.c_void_p(L.lame_init())
    frames, ch = pcm.shape
    if mode is None:
        mode = 3 if ch == 1 else 1
    L.lame_set_num_channels(gfp, ch)
    L.lame_set_in_samplerate(gfp, sample_rate)
    L.lame_set_out_samplerate(gfp, sample_rate)
    L.lame_set_brate(gfp, bitrate)
    L.lame_set_mode(gfp, mode)
    L.lame_set_quality(gfp, quality)
    L.lame_set_bWriteVbrTag(gfp, 1 if write_vbr_tag else 0)
    if hasattr(L, "lame_set_write_id3tag_automatic"):
        L.lame_set_write_id3tag_automatic(gfp, 0)
    if disable_reservoir and hasattr(L, "lame_set_disable_reservoir"):
        L.lame_set_disable_reservoir(gfp, 1)
    rc = L.lame_init_params(gfp)
    assert rc >= 0, f"lame_init_params failed: {rc}"

    pcm16 = np.ascontiguousarray(pcm.astype(np.int16))
    out = np.zeros(frames * 5 // 4 + 7200 + 1152 * 4, np.uint8)
    if ch == 2:
        n = L.lame_encode_buffer_interleaved(
            gfp,
            pcm16.ctypes.data_as(C.POINTER(C.c_short)),
            frames,
            out.ctypes.data_as(C.POINTER(C.c_ubyte)),
            len(out),
        )
    else:
        n = L.lame_encode_buffer(
            gfp,
            pcm16.ctypes.data_as(C.POINTER(C.c_short)),
            None,
            frames,
            out.ctypes.data_as(C.POINTER(C.c_ubyte)),
            len(out),
        )
    assert n >= 0, f"lame_encode_buffer failed: {n}"
    n2 = L.lame_encode_flush(
        gfp, out[n:].ctypes.data_as(C.POINTER(C.c_ubyte)), len(out) - n
    )
    assert n2 >= 0
    blob = bytearray(out[: n + n2].tobytes())
    if write_vbr_tag and hasattr(L, "lame_get_lametag_frame"):
        # the placeholder first frame must be patched with the final tag
        # (the file API does this via lame_mp3_tags_fid; with buffers the
        # tag frame is fetched explicitly and spliced over the start)
        tag = np.zeros(8192, np.uint8)
        L.lame_get_lametag_frame.restype = C.c_size_t
        tn = int(L.lame_get_lametag_frame(
            gfp, tag.ctypes.data_as(C.POINTER(C.c_ubyte)), len(tag)))
        if 0 < tn <= len(blob):
            blob[:tn] = tag[:tn].tobytes()
    L.lame_close(gfp)
    return bytes(blob)


# mpg123 constants
_MPG123_OK = 0
_MPG123_NEW_FORMAT = -11
_MPG123_NEED_MORE = -10
_MPG123_DONE = -12
_ENC_FLOAT_32 = 0x200


def mpg123_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode MP3 bytes → (float32 pcm [N, ch], sample_rate) via libmpg123."""
    assert have_mpg123()
    M = _mpg
    M.mpg123_new.restype = C.c_void_p
    err = C.c_int(0)
    h = C.c_void_p(M.mpg123_new(None, C.byref(err)))
    assert h.value, "mpg123_new failed"
    M.mpg123_format_none(h)
    for rate in (8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000):
        M.mpg123_format(h, C.c_long(rate), 3, _ENC_FLOAT_32)
    rc = M.mpg123_open_feed(h)
    assert rc == _MPG123_OK
    rc = M.mpg123_feed(h, blob, len(blob))
    assert rc == _MPG123_OK
    chunks = []
    rate = C.c_long(0)
    ch = C.c_int(0)
    enc = C.c_int(0)
    buf = (C.c_ubyte * 65536)()
    done = C.c_size_t(0)
    while True:
        rc = M.mpg123_read(h, buf, len(buf), C.byref(done))
        if done.value:
            chunks.append(bytes(buf[: done.value]))
        if rc == _MPG123_NEW_FORMAT:
            M.mpg123_getformat(h, C.byref(rate), C.byref(ch), C.byref(enc))
            assert enc.value == _ENC_FLOAT_32, hex(enc.value)
        elif rc in (_MPG123_NEED_MORE, _MPG123_DONE):
            break
        elif rc != _MPG123_OK:
            break
    M.mpg123_delete(h)
    data = b"".join(chunks)
    pcm = np.frombuffer(data, np.float32)
    nch = max(ch.value, 1)
    pcm = pcm[: len(pcm) // nch * nch].reshape(-1, nch)
    return pcm, int(rate.value)


class _Mp3Data(C.Structure):
    """lame.h mp3data_struct — hip decoder stream info."""

    _fields_ = [
        ("header_parsed", C.c_int), ("stereo", C.c_int),
        ("samplerate", C.c_int), ("bitrate", C.c_int),
        ("mode", C.c_int), ("mode_ext", C.c_int),
        ("framesize", C.c_int), ("nsamp", C.c_ulong),
        ("totalframes", C.c_int), ("framenum", C.c_int),
    ]


def hip_decode_mp3(blob: bytes) -> tuple[np.ndarray, int]:
    """Third MPEG decoder: LAME's built-in `hip` (the mpglib lineage —
    a 1997 fork of mpg123 0.59, ~25 years divergent from modern
    libmpg123's float core).  Decodes MP3 bytes → (float32 pcm
    [N, ch] normalized to ±1, sample_rate).  Output is int16-quantized
    by the library (~3e-5 RMS floor), coarse but far below the
    ~1.5e-3 inter-oracle divergence it arbitrates (docs/PARITY.md)."""
    assert have_lame()
    L = _lame
    L.hip_decode_init.restype = C.c_void_p
    hip = C.c_void_p(L.hip_decode_init())
    assert hip.value, "hip_decode_init failed"
    cap = 65536
    pcm_l = (C.c_short * cap)()
    pcm_r = (C.c_short * cap)()
    md = _Mp3Data()
    left: list[np.ndarray] = []
    right: list[np.ndarray] = []

    def drain(chunk: bytes) -> None:
        first = True
        while True:
            n = L.hip_decode1_headers(
                hip, chunk if first else b"", len(chunk) if first else 0,
                pcm_l, pcm_r, C.byref(md))
            first = False
            assert n >= 0, f"hip decode error {n}"
            if n == 0:
                return
            left.append(np.ctypeslib.as_array(pcm_l)[:n].copy())
            right.append(np.ctypeslib.as_array(pcm_r)[:n].copy())

    for at in range(0, len(blob), 4096):
        drain(blob[at: at + 4096])
    rate = int(md.samplerate)
    ch = 2 if md.stereo == 2 else 1
    L.hip_decode_exit(hip)
    l = (np.concatenate(left) if left else np.zeros(0, np.int16))
    cols = [l]
    if ch == 2:
        cols.append(np.concatenate(right) if right
                    else np.zeros(0, np.int16))
    pcm = np.stack(cols, axis=1).astype(np.float32) / 32768.0
    return pcm, rate


_twolame = None


def have_twolame() -> bool:
    global _twolame
    if _twolame is None:
        try:
            _twolame = C.CDLL("libtwolame.so.0")
        except OSError:
            _twolame = False
    return bool(_twolame)


def twolame_encode(
    pcm: np.ndarray, sample_rate: int = 44100, bitrate: int = 192,
    mode: int | None = None,
) -> bytes:
    """Encode [frames, channels] int16 PCM → MPEG Layer II bytes.

    mode: twolame's own enum — 0 stereo, 1 joint stereo, 2 dual channel,
    3 mono; None leaves TWOLAME_AUTO (picks by channel count).  Passing
    an out-of-range value (twolame prints "invalid mode") silently falls
    back to AUTO."""
    assert have_twolame()
    L = _twolame
    L.twolame_init.restype = C.c_void_p
    opts = C.c_void_p(L.twolame_init())
    frames, ch = pcm.shape
    L.twolame_set_num_channels(opts, ch)
    L.twolame_set_in_samplerate(opts, sample_rate)
    L.twolame_set_out_samplerate(opts, sample_rate)
    L.twolame_set_bitrate(opts, bitrate)
    if mode is not None:
        L.twolame_set_mode(opts, mode)
    rc = L.twolame_init_params(opts)
    assert rc == 0, f"twolame_init_params failed: {rc}"
    pcm16 = np.ascontiguousarray(pcm.astype(np.int16))
    out = np.zeros(frames * 4 + 16384, np.uint8)
    if ch == 2:
        n = L.twolame_encode_buffer_interleaved(
            opts, pcm16.ctypes.data_as(C.POINTER(C.c_short)), frames,
            out.ctypes.data_as(C.POINTER(C.c_ubyte)), len(out))
    else:
        n = L.twolame_encode_buffer(
            opts, pcm16.ctypes.data_as(C.POINTER(C.c_short)), None, frames,
            out.ctypes.data_as(C.POINTER(C.c_ubyte)), len(out))
    assert n >= 0, f"twolame_encode_buffer failed: {n}"
    n2 = L.twolame_encode_flush(
        opts, out[n:].ctypes.data_as(C.POINTER(C.c_ubyte)), len(out) - n)
    assert n2 >= 0
    L.twolame_close(C.byref(C.c_void_p(opts.value)))
    return bytes(out[: n + n2])


# ---------------------------------------------------------------- ffdec
# Second oracle: ffmpeg's mp3float decoder (an implementation family
# independent of mpg123), via the tests/ffdec.c shim built lazily here.

_ffdec = None


def have_ffdec() -> bool:
    global _ffdec
    if _ffdec is None:
        import os
        import subprocess

        d = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(d, "ffdec.c")
        so = os.path.join(d, "libffdec.so")
        try:
            if not os.path.exists(so) or (
                os.path.getmtime(so) < os.path.getmtime(src)
            ):
                subprocess.run(
                    ["gcc", "-O2", "-fPIC", "-shared", src, "-o", so,
                     "-lavcodec", "-lavutil"],
                    check=True, capture_output=True, timeout=120,
                )
            lib = C.CDLL(so)
            lib.ffdec_decode.restype = C.c_int64
            lib.ffdec_decode.argtypes = [
                C.c_char_p, C.c_int64, C.POINTER(C.c_float), C.c_int64,
                C.POINTER(C.c_int), C.POINTER(C.c_int),
            ]
            for fn in ("ffdec_decode_adpcm", "ffdec_decode_adpcm_ms",
                       "ffdec_decode_adpcm_ima_qt"):
                getattr(lib, fn).restype = C.c_int64
                getattr(lib, fn).argtypes = [
                    C.c_char_p, C.c_int64, C.c_int, C.c_int, C.c_int,
                    C.POINTER(C.c_float), C.c_int64, C.POINTER(C.c_int),
                ]
            _ffdec = lib
        except Exception:
            _ffdec = False
    return bool(_ffdec)


def ffdec_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode MPEG audio via libavcodec → (f32 [frames, ch], rate)."""
    assert have_ffdec()
    max_frames = len(blob) * 32 + (1 << 17)  # generous bound
    out = np.zeros((max_frames * 2,), np.float32)
    ch = C.c_int(0)
    rate = C.c_int(0)
    n = _ffdec.ffdec_decode(
        blob, len(blob), out.ctypes.data_as(C.POINTER(C.c_float)),
        max_frames, C.byref(ch), C.byref(rate))
    assert n >= 0, f"ffdec error {n}"
    c = max(ch.value, 1)
    return out[: n * c].reshape(n, c).copy(), rate.value

def ffdec_decode_adpcm(data: bytes, block_align: int, channels: int,
                       rate: int = 44100, kind: str = "ima") -> np.ndarray:
    """Decode WAV-layout IMA/MS ADPCM blocks via libavcodec → f32 [N, ch]."""
    assert have_ffdec()
    max_frames = (len(data) // block_align + 1) * (
        2 + (block_align - 4 * channels) * 2 // channels)
    out = np.zeros((max_frames * channels,), np.float32)
    ch = C.c_int(0)
    fn = {"ima": _ffdec.ffdec_decode_adpcm,
          "ms": _ffdec.ffdec_decode_adpcm_ms,
          "ima_qt": _ffdec.ffdec_decode_adpcm_ima_qt}[kind]
    n = fn(data, len(data), block_align, channels, rate,
           out.ctypes.data_as(C.POINTER(C.c_float)), max_frames,
           C.byref(ch))
    assert n >= 0, f"ffdec adpcm error {n}"
    c = max(ch.value, 1)
    return out[: n * c].reshape(n, c).copy()


def ffdec_decode_flac(blob: bytes, bps: int) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream via libavcodec → (int32 [frames, ch], rate).

    libavcodec emits >16-bit FLAC as S32 left-justified (shifted by
    32 - bits_per_raw_sample); this undoes the shift so values are the
    stream's raw integers, comparable to tests/flac_ref.py output."""
    assert have_ffdec()
    lib = _ffdec
    if not hasattr(lib, "_flac_bound"):
        lib.ffdec_decode_flac.restype = C.c_int64
        lib.ffdec_decode_flac.argtypes = [
            C.c_char_p, C.c_int64, C.POINTER(C.c_int32), C.c_int64,
            C.POINTER(C.c_int), C.POINTER(C.c_int), C.POINTER(C.c_int),
            C.POINTER(C.c_int),
        ]
        lib._flac_bound = True
    max_frames = len(blob) * 8 + (1 << 16)
    out = np.zeros((max_frames * 2,), np.int32)
    ch = C.c_int(0)
    rate = C.c_int(0)
    bits = C.c_int(0)
    fmt = C.c_int(-1)
    n = lib.ffdec_decode_flac(
        blob, len(blob), out.ctypes.data_as(C.POINTER(C.c_int32)),
        max_frames, C.byref(ch), C.byref(rate), C.byref(bits),
        C.byref(fmt))
    assert n >= 0, f"ffdec flac error {n}"
    c = max(ch.value, 1)
    vals = out[: n * c].reshape(n, c).copy()
    # libavcodec left-justifies FLAC samples in the container word:
    # S32 holds bps<32 shifted by 32-bps, S16 holds bps<16 by 16-bps
    raw_bits = bits.value or bps
    if fmt.value in (2, 7) and raw_bits < 32:  # AV_SAMPLE_FMT_S32(P)
        vals >>= 32 - raw_bits
    elif fmt.value in (1, 6) and raw_bits < 16:  # AV_SAMPLE_FMT_S16(P)
        vals >>= 16 - raw_bits
    return vals, rate.value


def ffdec_encode_flac_size(pcm: np.ndarray, rate: int, bits: int,
                           level: int = 5) -> int:
    """Total FLAC byte size libavcodec's encoder produces for int PCM
    ``[S, C]`` at the given compression level (5 = flac's default) —
    the compression-ratio oracle for codecs/flac/encode.py."""
    assert have_ffdec()
    lib = _ffdec
    if not hasattr(lib, "_flac_enc_bound"):
        lib.ffdec_encode_flac_size.restype = C.c_int64
        lib.ffdec_encode_flac_size.argtypes = [
            C.POINTER(C.c_int32), C.c_int64, C.c_int, C.c_int, C.c_int,
            C.c_int,
        ]
        lib._flac_enc_bound = True
    x = np.ascontiguousarray(pcm, np.int32)
    S, ch = x.shape
    n = lib.ffdec_encode_flac_size(
        x.ctypes.data_as(C.POINTER(C.c_int32)), S, ch, rate, bits, level)
    assert n > 0, f"ffdec flac encode error {n}"
    return int(n)
