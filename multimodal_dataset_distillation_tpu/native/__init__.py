"""Native (C++) runtime components.

``fastimage``: GIL-free JPEG decode + crop + bilinear-resize thread pool
(see ``fastimage.cpp``).  Built on demand with g++ against the system
libjpeg; all callers must handle :func:`get_fastimage` returning ``None``
(no compiler / no libjpeg / unsupported format) and fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastimage.cpp")
_SO = os.path.join(_DIR, "_fastimage.so")
_lock = threading.Lock()
_lib = None
_tried = False


class _FiTask(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.c_void_p),
        ("size", ctypes.c_int64),
        ("crop_x", ctypes.c_int32),
        ("crop_y", ctypes.c_int32),
        ("crop_w", ctypes.c_int32),
        ("crop_h", ctypes.c_int32),
        ("hflip", ctypes.c_int32),
    ]


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC,
             "-ljpeg", "-o", _SO + ".tmp"],
            check=True, capture_output=True, timeout=300)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception as e:  # no compiler / headers: PIL fallback
        print(f"fastimage: native build unavailable ({e}); using PIL")
        return None


def get_fastimage():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.fi_read_dims.restype = ctypes.c_int
        lib.fi_read_dims.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_int32),
                                     ctypes.POINTER(ctypes.c_int32)]
        lib.fi_decode_batch.restype = ctypes.c_int
        lib.fi_decode_batch.argtypes = [ctypes.POINTER(_FiTask),
                                        ctypes.c_int32, ctypes.c_void_p,
                                        ctypes.c_int32, ctypes.c_int32]
        _lib = lib
        return _lib


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[:3] == b"\xff\xd8\xff"


def read_dims(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) of a JPEG byte string, header-only parse."""
    lib = get_fastimage()
    if lib is None or not is_jpeg(data):
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    buf = (ctypes.c_char * len(data)).from_buffer_copy(data)
    if lib.fi_read_dims(ctypes.addressof(buf), len(data),
                        ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return int(w.value), int(h.value)


def decode_batch(items: Sequence[Tuple[bytes, Tuple[int, int, int, int], bool]],
                 out_size: int,
                 n_threads: Optional[int] = None) -> Tuple[np.ndarray, List[int]]:
    """Decode JPEGs to (N, out_size, out_size, 3) uint8 RGB.

    items: (jpeg_bytes, (crop_x, crop_y, crop_w, crop_h), hflip) per image.
    Returns (array, failed_indices) — failed slots are zeros; the caller
    re-decodes those via PIL.
    """
    lib = get_fastimage()
    if lib is None:
        raise RuntimeError("fastimage native library unavailable")
    n = len(items)
    out = np.zeros((n, out_size, out_size, 3), np.uint8)
    keep = []  # keep buffers alive through the call
    tasks = (_FiTask * n)()
    for i, (data, (cx, cy, cw, ch), flip) in enumerate(items):
        buf = (ctypes.c_char * len(data)).from_buffer_copy(data)
        keep.append(buf)
        tasks[i] = _FiTask(ctypes.addressof(buf), len(data),
                           cx, cy, cw, ch, int(flip))
    nt = n_threads or min(8, os.cpu_count() or 1)
    nfail = lib.fi_decode_batch(tasks, n, out.ctypes.data_as(ctypes.c_void_p),
                                out_size, nt)
    failed = []
    if nfail:
        failed = [i for i in range(n) if not out[i].any()]
    return out, failed
