"""ctypes binding to the native runtime library (libblastrt.so).

Exposes the three native services the reference implements via FFI
(runtime.rs): the lock-free SPSC command ring (commands.rs:11-69), the
playback sink (ALSA when present, null otherwise — runtime.rs:251-394),
and raw-terminal control (runtime.rs:431-458).  Pure-Python fallbacks
keep everything working when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes as C
import os
import queue
import subprocess
import threading
import time

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native")
_SO = os.path.join(_DIR, "libblastrt.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.join(_DIR, "runtime.cc")
        if not os.path.exists(_SO) or (
            os.path.exists(src) and os.path.getmtime(_SO) < os.path.getmtime(src)
        ):
            try:
                subprocess.run(["make", "-C", _DIR, "libblastrt.so"],
                               check=True, capture_output=True, timeout=300)
            except Exception:
                return None
        try:
            lib = C.CDLL(_SO)
        except OSError:
            return None
        lib.spsc_create.restype = C.c_void_p
        lib.spsc_create.argtypes = [C.c_int]
        lib.spsc_destroy.argtypes = [C.c_void_p]
        lib.spsc_push.argtypes = [C.c_void_p, C.c_char_p]
        lib.spsc_pop.argtypes = [C.c_void_p, C.c_char_p]
        lib.sink_open.restype = C.c_void_p
        lib.sink_open.argtypes = [C.c_char_p, C.c_int, C.c_int]
        lib.sink_open_mode.restype = C.c_void_p
        lib.sink_open_mode.argtypes = [C.c_char_p, C.c_int, C.c_int, C.c_int]
        lib.sink_is_null.argtypes = [C.c_void_p]
        lib.sink_mode.argtypes = [C.c_void_p]
        lib.sink_write.restype = C.c_int
        lib.sink_write.argtypes = [C.c_void_p, C.POINTER(C.c_int16), C.c_int]
        lib.sink_close.argtypes = [C.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class CmdRing:
    """Lock-free native SPSC ring (cap-1 usable slots), or a Python queue
    fallback with the same try-push/try-pop surface."""

    def __init__(self, capacity: int = 256):
        lib = _load()
        self._lib = lib
        if lib is not None:
            self._h = lib.spsc_create(capacity)
            self._buf = C.create_string_buffer(256)
        else:
            self._q: queue.Queue = queue.Queue(maxsize=capacity - 1)

    def try_push(self, cmd: str) -> bool:
        if self._lib is not None:
            return self._lib.spsc_push(self._h, cmd.encode()) == 0
        try:
            self._q.put_nowait(cmd)
            return True
        except queue.Full:
            return False

    def try_pop(self) -> str | None:
        if self._lib is not None:
            if self._lib.spsc_pop(self._h, self._buf) != 0:
                return None
            return self._buf.value.decode(errors="replace")
        try:
            return self._q.get_nowait()
        except queue.Empty:
            return None

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.spsc_destroy(self._h)
            self._h = None


class Sink:
    """Playback sink: ALSA device when available, else a real-time-paced
    null sink; optional capture buffer for tests/offline rendering."""

    def __init__(self, device: str, rate: int, channels: int,
                 capture: bool = False, realtime: bool = True,
                 mode: str = "auto"):
        """mode: "auto" (mmap with writei fallback, like the reference's
        MMAP_INTERLEAVED device, runtime.rs:267-295), "writei", or
        "mmap" (required — null sink if unsupported)."""
        self.rate = rate
        self.channels = channels
        self.capture = [] if capture else None
        self._h = None
        self._realtime = realtime
        lib = _load()
        self._lib = lib
        if lib is not None and realtime:
            m = {"auto": 0, "writei": 1, "mmap": 2}[mode]
            self._h = lib.sink_open_mode(device.encode(), rate, channels, m)

    @property
    def is_hardware(self) -> bool:
        return (
            self._h is not None
            and self._lib is not None
            and self._lib.sink_is_null(self._h) == 0
        )

    @property
    def mode(self) -> str:
        """"null", "writei" or "mmap" — which device path is active."""
        if self._h is None or self._lib is None:
            return "null"
        return {0: "null", 1: "writei", 2: "mmap"}[
            int(self._lib.sink_mode(self._h))]

    def write(self, block: np.ndarray) -> None:
        """block: f32 [frames, channels] in [-1, 1]."""
        pcm = np.clip(np.round(block * 32767.0), -32768, 32767).astype("<i2")
        if self.capture is not None:
            self.capture.append(pcm.copy())
        if self._h is not None:
            flat = np.ascontiguousarray(pcm)
            self._lib.sink_write(
                self._h, flat.ctypes.data_as(C.POINTER(C.c_int16)), pcm.shape[0]
            )
        elif self._realtime:
            time.sleep(pcm.shape[0] / self.rate)

    def close(self) -> None:
        if self._h is not None and self._lib is not None:
            self._lib.sink_close(self._h)
            self._h = None


class RawTerminal:
    """Raw-mode guard with signal/exception-safe restore
    (≙ raw_mode + panic hook, runtime.rs:419-452)."""

    def __enter__(self):
        lib = _load()
        self._lib = lib
        self._on = bool(lib and lib.term_raw_on() == 0)
        return self

    def read_char(self) -> int:
        if self._lib is None:
            data = os.read(0, 1)
            return data[0] if data else -1
        return self._lib.term_read_char()

    def __exit__(self, *exc):
        if self._lib is not None and self._on:
            self._lib.term_raw_off()
        return False
