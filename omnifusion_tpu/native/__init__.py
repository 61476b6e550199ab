"""Native (C++) host-side components with ctypes bindings.

Currently: a minimal OpenEXR scanline reader (exr_reader.cpp) used by the
360D dataset loader when no Python EXR reader is available.  The shared
library is compiled on first use with g++ and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "exr_reader.cpp")
_LIB = os.path.join(_HERE, "libexr_reader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB + ".tmp", "-lz"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_LIB + ".tmp", _LIB)
    return _LIB


def _get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.exr_read_channel.restype = ctypes.c_int
            lib.exr_read_channel.argtypes = [
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
    return _lib


_ERRORS = {
    1: "cannot open file",
    2: "cannot read file",
    3: "bad EXR header (or tiled/multi-part file)",
    4: "unsupported compression (only NONE/ZIPS/ZIP)",
    5: "channel not found",
    6: "corrupt chunk table",
    7: "zlib inflate failed",
}


def read_exr_channel(path: str, channel: str = "R") -> np.ndarray:
    """Read one channel of a scanline EXR file -> float32 (H, W)."""
    lib = _get_lib()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.exr_read_channel(path.encode(), channel.encode(), None, w, h)
    if rc != 0:
        raise RuntimeError(f"EXR read {path!r}: {_ERRORS.get(rc, rc)}")
    out = np.empty((h.value, w.value), np.float32)
    rc = lib.exr_read_channel(
        path.encode(),
        channel.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w,
        h,
    )
    if rc != 0:
        raise RuntimeError(f"EXR read {path!r}: {_ERRORS.get(rc, rc)}")
    return out
