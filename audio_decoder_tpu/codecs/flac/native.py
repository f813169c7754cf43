"""ctypes binding to the native flacfe bit-serial helpers.

The C library (audio_decoder_tpu/native/flacfe.cc) implements the hot
inner loops of the FLAC structural walk — rice-run skipping and the
frame CRC-8/16 — with the exact contracts of the pure-Python versions
in ``frontend`` (which stay as the behavioral oracle and the fallback
when no toolchain is present).  Built lazily like the mp3fe binding.
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO = os.path.join(_DIR, "libflacfe.so")

_lock = threading.Lock()
_lib = None
_tried = False

#: outlier-triple capacity per skip_rice call — quotients past Q_CAP are
#: rare encoder pathologies; a partition has < 2^16 codes, and a stream
#: dense in outliers would re-walk via the Python path anyway
_OUT_CAP = 4096


def _build() -> bool:
    src = os.path.join(_DIR, "flacfe.cc")
    if not os.path.exists(src):
        return False
    deps = [src] + [p for p in (os.path.join(_DIR, "Makefile"),)
                    if os.path.exists(p)]
    newest = max(os.path.getmtime(p) for p in deps)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= newest:
        return True
    try:
        subprocess.run(["make", "-C", _DIR, "libflacfe.so"],
                       check=True, capture_output=True, timeout=300)
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
        lib.flacfe_skip_rice.restype = C.c_int64
        lib.flacfe_skip_rice.argtypes = [
            C.c_char_p, C.c_int64, C.c_int64, C.c_int64, C.c_int32,
            C.c_int32, C.POINTER(C.c_int64), C.c_int64,
            C.POINTER(C.c_int64), C.c_int64, C.POINTER(C.c_int64),
        ]
        lib.flacfe_crc8.restype = C.c_uint32
        lib.flacfe_crc8.argtypes = [C.c_char_p, C.c_int64]
        lib.flacfe_crc16.restype = C.c_uint32
        lib.flacfe_crc16.argtypes = [C.c_char_p, C.c_int64]
        lib.flacfe_walk_open.restype = C.c_void_p
        lib.flacfe_walk_open.argtypes = [
            C.POINTER(C.c_char_p), C.POINTER(C.c_int64), C.c_int32,
            C.c_int32, C.c_int64, C.c_int32, C.c_int64, C.c_int32,
        ]
        lib.flacfe_walk_info.restype = None
        lib.flacfe_walk_info.argtypes = [
            C.c_void_p, C.POINTER(C.c_int64), C.POINTER(C.c_uint8)]
        lib.flacfe_walk_fill.restype = None
        lib.flacfe_walk_fill.argtypes = [C.c_void_p, C.c_int32] + (
            [C.c_void_p] * 24)
        lib.flacfe_walk_free.restype = None
        lib.flacfe_walk_free.argtypes = [C.c_void_p]
        lib.flacfe_walks.restype = C.c_int64
        lib.flacfe_walks.argtypes = []
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def skip_rice(blob: bytes, nbits: int, pos: int, count: int,
              param: int, q_cap: int, split: int = 0,
              ) -> tuple[int, list, np.ndarray] | None:
    """(new_pos, outlier triples, split bit positions) — or None when
    the native path can't serve this call (no library / EOF semantics /
    outlier overflow), in which case the caller falls back to the
    Python walk, whose error taxonomy is the contract.  With
    ``split`` > 0, entry k of the positions array is the bit cursor
    before code (k+1)*split — the lane-cut points."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((_OUT_CAP, 3), np.int64)
    scap = (count - 1) // split if split > 0 else 0
    splits = np.empty((max(scap, 1),), np.int64)
    n_out = C.c_int64(0)
    new_pos = lib.flacfe_skip_rice(
        blob, nbits, pos, count, param, q_cap,
        out.ctypes.data_as(C.POINTER(C.c_int64)), _OUT_CAP,
        C.byref(n_out), split,
        splits.ctypes.data_as(C.POINTER(C.c_int64)),
    )
    if new_pos < 0:
        return None
    triples = [(int(a), int(b), int(c)) for a, b, c in out[: n_out.value]]
    return int(new_pos), triples, splits[:scap]


def walks() -> int | None:
    """Cumulative native whole-file walks (test pin counter)."""
    lib = _load()
    return int(lib.flacfe_walks()) if lib is not None else None


def walk_batch(blobs: list[bytes], q_cap: int, split: int, max_bps: int,
               bit_cap: int) -> list[dict | int] | None:
    """Whole-file walks of a batch, threaded in C — one dict of
    FlacAnalysis fields per clean file, the walker's int error code
    (core.errors ERR_*) per rejected file (the caller re-walks those in
    Python so its exception taxonomy/messages stay authoritative).
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None or not blobs:
        return None if lib is None else []
    n = len(blobs)
    blobs = [bytes(b) for b in blobs]
    arr = (C.c_char_p * n)(*blobs)
    lens = (C.c_int64 * n)(*[len(b) for b in blobs])
    sess = lib.flacfe_walk_open(arr, lens, n, q_cap, split, max_bps,
                                bit_cap, 0)
    try:
        info = np.zeros((n, 12), np.int64)
        md5 = np.zeros((n, 16), np.uint8)
        lib.flacfe_walk_info(
            sess, info.ctypes.data_as(C.POINTER(C.c_int64)),
            md5.ctypes.data_as(C.POINTER(C.c_uint8)))
        out: list[dict | int] = []
        for i in range(n):
            err, rate, ch, bits, total, got, _fs, F, S, R, W, D = (
                int(v) for v in info[i])
            if err:
                out.append(err)
                continue
            d = dict(
                sample_rate=rate, channels=ch, bits=bits,
                total=total or got, md5=md5[i].tobytes(),
                blocksizes=np.empty(F, np.int32),
                starts=np.empty(F, np.int64),
                ch_mode=np.empty(F, np.int32),
                byte_offs=np.empty(F + 1, np.int64),
                sub_frame=np.empty(S, np.int32),
                sub_ch=np.empty(S, np.int32),
                sub_kind=np.empty(S, np.int32),
                sub_order=np.empty(S, np.int32),
                sub_shift=np.empty(S, np.int32),
                sub_wasted=np.empty(S, np.int32),
                sub_coeffs=np.empty((S, 32), np.int32),
                rl_sub=np.empty(R, np.int32),
                rl_bitpos=np.empty(R, np.int64),
                rl_count=np.empty(R, np.int32),
                rl_param=np.empty(R, np.int32),
                rl_dest=np.empty(R, np.int32),
                fw_sub=np.empty(W, np.int32),
                fw_bitpos=np.empty(W, np.int64),
                fw_count=np.empty(W, np.int32),
                fw_width=np.empty(W, np.int32),
                fw_dest=np.empty(W, np.int32),
                dv_sub=np.empty(D, np.int32),
                dv_dest=np.empty(D, np.int32),
                dv_val=np.empty(D, np.int32),
            )
            lib.flacfe_walk_fill(
                sess, i, *(d[k].ctypes.data_as(C.c_void_p) for k in (
                    "blocksizes", "starts", "ch_mode", "byte_offs",
                    "sub_frame", "sub_ch", "sub_kind", "sub_order",
                    "sub_shift", "sub_wasted", "sub_coeffs",
                    "rl_sub", "rl_bitpos", "rl_count", "rl_param", "rl_dest",
                    "fw_sub", "fw_bitpos", "fw_count", "fw_width", "fw_dest",
                    "dv_sub", "dv_dest", "dv_val")))
            out.append(d)
        return out
    finally:
        lib.flacfe_walk_free(sess)


def crc8(data) -> int | None:
    lib = _load()
    if lib is None:
        return None
    b = bytes(data)
    return int(lib.flacfe_crc8(b, len(b)))


def crc16(data) -> int | None:
    lib = _load()
    if lib is None:
        return None
    b = bytes(data)
    return int(lib.flacfe_crc16(b, len(b)))
