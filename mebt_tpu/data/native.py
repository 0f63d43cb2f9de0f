"""ctypes bindings for the native C++ frame decoder (csrc/frameloader.cpp).

Auto-builds `csrc/libmebt_io.so` via make on first use when a compiler
is present; falls back to None (callers use PIL) otherwise.

  python -m mebt_tpu.data.native build   # explicit build
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libmebt_io.so"))
_lib = None
_tried = False


def build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_CSRC)],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mebt_decode_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.mebt_decode_frame.restype = ctypes.c_int
        lib.mebt_decode_clip.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.mebt_decode_clip.restype = ctypes.c_int
        lib.mebt_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mebt_probe.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_clip(paths: list[str], resolution: int, n_threads: int = 4
                ) -> np.ndarray | None:
    """Decode, center-crop, resize, normalize a clip of frames.

    Returns (T, res, res, 3) float32 in [-0.5, 0.5], or None if the
    native library is unavailable or any frame fails (caller falls back
    to PIL).
    """
    lib = get_lib()
    if lib is None:
        return None
    t = len(paths)
    out = np.empty((t, resolution, resolution, 3), np.float32)
    arr = (ctypes.c_char_p * t)(*[p.encode() for p in paths])
    failures = lib.mebt_decode_clip(
        arr, t, resolution, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if failures:
        return None
    return out


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        ok = build()
        print("built" if ok else "build FAILED")
        sys.exit(0 if ok else 1)
    print(f"native loader available: {available()}")
