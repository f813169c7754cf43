"""ctypes binding to the native mp3fe bitstream front-end.

The C++ library (audio_decoder_tpu/native/mp3fe.cc) implements the exact
output contract of the pure-Python ``frontend.analyze``; this module builds
it lazily with the system toolchain and exposes:

* ``available()`` — whether the native library could be built/loaded;
* ``probe(blob)`` — cheap geometry walk (sr, channels, granules, joint);
* ``analyze_batch(blobs, g_cap, channels, joint)`` — threaded batch
  analysis straight into the padded [B, G, ...] tensors the DSP tail eats.

If the toolchain is missing the decoder silently falls back to the Python
front-end — same results, lower throughput.
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO = os.path.join(_DIR, "libmp3fe.so")

_lock = threading.Lock()
_lib = None
_tried = False


class _Info(C.Structure):
    _fields_ = [
        ("sample_rate", C.c_int32),
        ("channels", C.c_int32),
        ("n_granules", C.c_int32),
        ("joint", C.c_int32),
        ("err", C.c_int32),
        ("main_bytes", C.c_int32),
    ]


def _build() -> bool:
    src = os.path.join(_DIR, "mp3fe.cc")
    if not os.path.exists(src):
        return False
    # stale if older than ANY build input (the generated LUT header and
    # the Makefile change without mp3fe.cc changing)
    deps = [src] + [
        p for p in (
            os.path.join(_DIR, "huffman_lut.h"),
            os.path.join(_DIR, "Makefile"),
        ) if os.path.exists(p)
    ]
    newest = max(os.path.getmtime(p) for p in deps)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= newest:
        return True
    try:
        subprocess.run(
            ["make", "-C", _DIR, "all"],
            check=True, capture_output=True, timeout=300,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            lib = C.CDLL(_SO)
        except OSError:
            return None
        lib.mp3fe_probe.argtypes = [C.c_char_p, C.c_int64, C.POINTER(_Info)]
        lib.mp3fe_analyze_batch.argtypes = [
            C.POINTER(C.c_char_p), C.POINTER(C.c_int64), C.c_int32, C.c_int32,
            C.c_int32,
            C.POINTER(C.c_int16), C.POINTER(C.c_int16), C.POINTER(C.c_int8),
            C.POINTER(C.c_int8), C.POINTER(_Info), C.c_int32,
        ]
        lib.mp3fe_lanes_batch.argtypes = [
            C.POINTER(C.c_char_p), C.POINTER(C.c_int64), C.c_int32, C.c_int32,
            C.c_int64, C.c_int32,
            C.POINTER(C.c_uint8),
            C.POINTER(C.c_int32), C.POINTER(C.c_int32), C.POINTER(C.c_int32),
            C.POINTER(C.c_int16), C.POINTER(C.c_int16), C.POINTER(C.c_int16),
            C.POINTER(C.c_int8), C.POINTER(C.c_int8), C.POINTER(C.c_int8),
            C.POINTER(C.c_int16), C.POINTER(C.c_int8), C.POINTER(C.c_int8),
            C.POINTER(C.c_int8), C.POINTER(_Info), C.c_int32,
        ]
        lib.mp3fe_open_batch.restype = C.c_void_p
        lib.mp3fe_open_batch.argtypes = [
            C.POINTER(C.c_char_p), C.POINTER(C.c_int64), C.c_int32, C.c_int32,
            C.POINTER(_Info), C.POINTER(C.c_int32),
        ]
        lib.mp3fe_close.argtypes = [C.c_void_p]
        lib.mp3fe_frame_walks.restype = C.c_int64
        lib.mp3fe_frame_walks.argtypes = []
        lib.mp3fe_lanes_batch_session.argtypes = [
            C.c_void_p, C.POINTER(C.c_int32), C.c_int32, C.c_int32,
            C.c_int64, C.c_int32,
            C.POINTER(C.c_uint8),
            C.POINTER(C.c_int32), C.POINTER(C.c_int32), C.POINTER(C.c_int32),
            C.POINTER(C.c_int16), C.POINTER(C.c_int16), C.POINTER(C.c_int16),
            C.POINTER(C.c_int8), C.POINTER(C.c_int8), C.POINTER(C.c_int8),
            C.POINTER(C.c_int16), C.POINTER(C.c_int8), C.POINTER(C.c_int8),
            C.POINTER(C.c_int8), C.POINTER(_Info), C.c_int32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def frame_walks() -> int:
    """Process-wide count of native frame walks (tests pin 1 per blob)."""
    lib = _load()
    assert lib is not None
    return int(lib.mp3fe_frame_walks())


class Mp3Session:
    """One-walk-per-blob front-end session (≙ the single pass of the
    reference's mpeg.rs:7-128).

    Opening walks every blob exactly once (threaded C++), capturing the
    per-file frame tables; ``infos`` (geometry summaries for grouping),
    ``layers`` (front-end routing) and :meth:`lanes_batch` (lane
    emission with the channel guard) all feed off that single walk.
    Blob references are held for the session's lifetime — the C++ side
    stores raw pointers into them."""

    def __init__(self, blobs: list[bytes], nthreads: int = 0):
        lib = _load()
        assert lib is not None
        self._lib = lib
        self._blobs = list(blobs)  # keep the buffers alive
        n = len(self._blobs)
        self._buf_ptrs = (C.c_char_p * n)(*self._blobs)
        self._lens = (C.c_int64 * n)(*[len(b) for b in self._blobs])
        infos = (_Info * n)()
        layers = (C.c_int32 * n)()
        self._handle = C.c_void_p(lib.mp3fe_open_batch(
            self._buf_ptrs, self._lens, n, nthreads, infos, layers))
        self.infos = [
            dict(sample_rate=i.sample_rate, channels=i.channels,
                 n_granules=i.n_granules, joint=bool(i.joint), err=i.err,
                 main_bytes=i.main_bytes)
            for i in infos
        ]
        self.layers = [int(x) for x in layers]

    def lanes_batch(self, file_idx: list[int], g_cap: int, m_cap: int,
                    channels: int, nthreads: int = 0) -> dict:
        """Lane emission for selected session files — same output layout
        as module-level :func:`lanes_batch`, but no re-walk."""
        assert self._handle
        assert m_cap % 4 == 0
        B = len(file_idx)
        G, ch = g_cap, channels
        main = np.zeros((B, m_cap), np.uint8)
        start = np.zeros((B, G, ch), np.int32)
        end = np.zeros((B, G, ch), np.int32)
        limit = np.zeros((B, G, ch), np.int32)
        big = np.zeros((B, G, ch), np.int16)
        r1 = np.zeros((B, G, ch), np.int16)
        r2 = np.zeros((B, G, ch), np.int16)
        tsel = np.zeros((B, G, ch, 3), np.int8)
        c1 = np.zeros((B, G, ch), np.int8)
        valid = np.zeros((B, G, ch), np.int8)
        exp_b = np.zeros((B, G, ch, 61), np.int16)
        cfg = np.zeros((B, G, ch), np.int8)
        stflags = np.zeros((B, G), np.int8)
        sfr = np.zeros((B, G, 61), np.int8)
        infos = (_Info * B)()
        idx = (C.c_int32 * B)(*file_idx)
        self._lib.mp3fe_lanes_batch_session(
            self._handle, idx, B, g_cap, m_cap, channels,
            main.ctypes.data_as(C.POINTER(C.c_uint8)),
            start.ctypes.data_as(C.POINTER(C.c_int32)),
            end.ctypes.data_as(C.POINTER(C.c_int32)),
            limit.ctypes.data_as(C.POINTER(C.c_int32)),
            big.ctypes.data_as(C.POINTER(C.c_int16)),
            r1.ctypes.data_as(C.POINTER(C.c_int16)),
            r2.ctypes.data_as(C.POINTER(C.c_int16)),
            tsel.ctypes.data_as(C.POINTER(C.c_int8)),
            c1.ctypes.data_as(C.POINTER(C.c_int8)),
            valid.ctypes.data_as(C.POINTER(C.c_int8)),
            exp_b.ctypes.data_as(C.POINTER(C.c_int16)),
            cfg.ctypes.data_as(C.POINTER(C.c_int8)),
            stflags.ctypes.data_as(C.POINTER(C.c_int8)),
            sfr.ctypes.data_as(C.POINTER(C.c_int8)),
            infos, nthreads,
        )
        return dict(
            main=main, start=start, end=end, limit=limit, big=big, r1=r1,
            r2=r2, tsel=tsel, c1sel=c1, valid=valid, exp_b=exp_b, cfg=cfg,
            stflags=stflags, sfr=sfr,
            err=np.asarray([i.err for i in infos], np.int32),
            n_granules=np.asarray([i.n_granules for i in infos], np.int32),
            sample_rate=np.asarray([i.sample_rate for i in infos], np.int32),
            channels=np.asarray([i.channels for i in infos], np.int32),
            main_bytes=np.asarray([i.main_bytes for i in infos], np.int32),
        )

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.mp3fe_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


def probe(blob: bytes) -> dict:
    """Geometry-only frame walk: sr/channels/n_granules/joint/err."""
    lib = _load()
    assert lib is not None
    info = _Info()
    lib.mp3fe_probe(blob, len(blob), C.byref(info))
    return dict(
        sample_rate=info.sample_rate, channels=info.channels,
        n_granules=info.n_granules, joint=bool(info.joint), err=info.err,
        main_bytes=info.main_bytes,
    )


def analyze_batch(
    blobs: list[bytes], g_cap: int, channels: int, joint: bool,
    nthreads: int = 0,
) -> dict:
    """Analyze a uniform (channels, joint) group of MP3 blobs.

    Returns dict with zero-padded, transfer-compact host tensors:
      is_q  int16 [B, G, C, 576]   exp_b int16 [B, G, C, 61]
      st    int8  [B, G, 576] or None  (stereo mode bytes)
      cfg   int8  [B, G, C]  (block_type | mixed<<2)
      err   int32 [B]        n_granules int32 [B]
    """
    lib = _load()
    assert lib is not None
    B = len(blobs)
    is_q = np.zeros((B, g_cap, channels, 576), np.int16)
    exp_b = np.zeros((B, g_cap, channels, 61), np.int16)
    st = None
    st_ptr = C.cast(None, C.POINTER(C.c_int8))
    if channels == 2 and joint:
        st = np.zeros((B, g_cap, 576), np.int8)
        st_ptr = st.ctypes.data_as(C.POINTER(C.c_int8))
    cfg = np.zeros((B, g_cap, channels), np.int8)
    infos = (_Info * B)()

    buf_ptrs = (C.c_char_p * B)(*blobs)
    lens = (C.c_int64 * B)(*[len(b) for b in blobs])
    lib.mp3fe_analyze_batch(
        buf_ptrs, lens, B, g_cap, channels,
        is_q.ctypes.data_as(C.POINTER(C.c_int16)),
        exp_b.ctypes.data_as(C.POINTER(C.c_int16)),
        st_ptr,
        cfg.ctypes.data_as(C.POINTER(C.c_int8)),
        infos, nthreads,
    )
    return dict(
        is_q=is_q, exp_b=exp_b, st=st, cfg=cfg,
        err=np.asarray([i.err for i in infos], np.int32),
        n_granules=np.asarray([i.n_granules for i in infos], np.int32),
        sample_rate=np.asarray([i.sample_rate for i in infos], np.int32),
        channels=np.asarray([i.channels for i in infos], np.int32),
    )


def lanes_batch(
    blobs: list[bytes], g_cap: int, m_cap: int, channels: int,
    nthreads: int = 0,
) -> dict:
    """Lane-metadata analysis of a uniform-channel group of MP3 blobs for
    the on-device Huffman path (dsp.mp3_decode_fused).

    Returns dict of zero-padded host tensors:
      main  uint8 [B, Mcap]           start/end/limit int32 [B, G, C]
      big/r1/r2 int16 [B, G, C]       tsel int8 [B, G, C, 3]
      c1sel/valid/cfg int8 [B, G, C]  exp_b int16 [B, G, C, 61]
      stflags int8 [B, G]             sfr int8 [B, G, 61]
      err/n_granules/sample_rate/channels/main_bytes int32 [B]
    """
    lib = _load()
    assert lib is not None
    assert m_cap % 4 == 0
    B = len(blobs)
    G, ch = g_cap, channels
    main = np.zeros((B, m_cap), np.uint8)
    start = np.zeros((B, G, ch), np.int32)
    end = np.zeros((B, G, ch), np.int32)
    limit = np.zeros((B, G, ch), np.int32)
    big = np.zeros((B, G, ch), np.int16)
    r1 = np.zeros((B, G, ch), np.int16)
    r2 = np.zeros((B, G, ch), np.int16)
    tsel = np.zeros((B, G, ch, 3), np.int8)
    c1 = np.zeros((B, G, ch), np.int8)
    valid = np.zeros((B, G, ch), np.int8)
    exp_b = np.zeros((B, G, ch, 61), np.int16)
    cfg = np.zeros((B, G, ch), np.int8)
    stflags = np.zeros((B, G), np.int8)
    sfr = np.zeros((B, G, 61), np.int8)
    infos = (_Info * B)()

    buf_ptrs = (C.c_char_p * B)(*blobs)
    lens = (C.c_int64 * B)(*[len(b) for b in blobs])
    lib.mp3fe_lanes_batch(
        buf_ptrs, lens, B, g_cap, m_cap, channels,
        main.ctypes.data_as(C.POINTER(C.c_uint8)),
        start.ctypes.data_as(C.POINTER(C.c_int32)),
        end.ctypes.data_as(C.POINTER(C.c_int32)),
        limit.ctypes.data_as(C.POINTER(C.c_int32)),
        big.ctypes.data_as(C.POINTER(C.c_int16)),
        r1.ctypes.data_as(C.POINTER(C.c_int16)),
        r2.ctypes.data_as(C.POINTER(C.c_int16)),
        tsel.ctypes.data_as(C.POINTER(C.c_int8)),
        c1.ctypes.data_as(C.POINTER(C.c_int8)),
        valid.ctypes.data_as(C.POINTER(C.c_int8)),
        exp_b.ctypes.data_as(C.POINTER(C.c_int16)),
        cfg.ctypes.data_as(C.POINTER(C.c_int8)),
        stflags.ctypes.data_as(C.POINTER(C.c_int8)),
        sfr.ctypes.data_as(C.POINTER(C.c_int8)),
        infos, nthreads,
    )
    return dict(
        main=main, start=start, end=end, limit=limit, big=big, r1=r1, r2=r2,
        tsel=tsel, c1sel=c1, valid=valid, exp_b=exp_b, cfg=cfg,
        stflags=stflags, sfr=sfr,
        err=np.asarray([i.err for i in infos], np.int32),
        n_granules=np.asarray([i.n_granules for i in infos], np.int32),
        sample_rate=np.asarray([i.sample_rate for i in infos], np.int32),
        channels=np.asarray([i.channels for i in infos], np.int32),
        main_bytes=np.asarray([i.main_bytes for i in infos], np.int32),
    )
