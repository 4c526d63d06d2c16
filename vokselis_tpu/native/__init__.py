"""ctypes bindings to the native C++ IO runtime (native/vokselis_native.cpp).

Builds on first use with g++ if the shared library is missing; every entry
point degrades to the pure-Python implementation when the toolchain or
library is unavailable (callers use try/except around these)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "vokselis_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libvokselis_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.isfile(src):
        return False
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        src, "-o", _LIB_PATH, "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        src = os.path.abspath(_SRC)
        stale = (
            os.path.isfile(_LIB_PATH)
            and os.path.isfile(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )
        if (not os.path.isfile(_LIB_PATH) or stale) and not _build():
            if not os.path.isfile(_LIB_PATH):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.vx_load_raw.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
        lib.vx_write_png.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vx_strip_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vx_recorder_new.restype = ctypes.c_void_p
        lib.vx_recorder_start_video.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vx_recorder_push_frame.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vx_recorder_screenshot.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vx_recorder_finish_video.argtypes = [ctypes.c_void_p]
        lib.vx_recorder_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def load_raw_native(path: str, size: int):
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(size, np.uint8)
    rc = lib.vx_load_raw(path.encode(), out.ctypes.data, size)
    return out if rc == 0 else None


def write_png_native(path: str, img: np.ndarray, level: int = 1) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        return False
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    rc = lib.vx_write_png(path.encode(), img.ctypes.data, h, w, c, level)
    return rc == 0


class NativeRecorder:
    """Native worker-thread frame sink (Recorder, recorder.rs:25-72)."""

    def __init__(self):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.vx_recorder_new()

    def start_video(self, path: str, width: int, height: int, fps: int = 60) -> bool:
        return self._lib.vx_recorder_start_video(
            self._h, path.encode(), width, height, fps) == 0

    def push_frame(self, frame: np.ndarray):
        frame = np.ascontiguousarray(frame)
        h, w, c = frame.shape
        self._lib.vx_recorder_push_frame(self._h, frame.ctypes.data, h, w, c)

    def screenshot(self, path: str, frame: np.ndarray):
        frame = np.ascontiguousarray(frame)
        if frame.ndim == 2:
            frame = frame[:, :, None]
        h, w, c = frame.shape
        self._lib.vx_recorder_screenshot(
            self._h, path.encode(), frame.ctypes.data, h, w, c)

    def finish_video(self):
        self._lib.vx_recorder_finish_video(self._h)

    def close(self):
        if self._h:
            self._lib.vx_recorder_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
