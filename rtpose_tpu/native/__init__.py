"""ctypes bindings for the native C++ cube loader.

Builds lazily via ``make`` on first use (g++ is in the image; pybind11 is
not, hence the plain C ABI + ctypes).  Falls back cleanly when the
toolchain is unavailable: ``load_cube`` returns None and callers use the
numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "librtpose_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.rtp_probe.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_long),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_char)]
        lib.rtp_probe.restype = ctypes.c_int
        lib.rtp_load_cube.argtypes = [
            ctypes.c_char_p] + [ctypes.c_long] * 6 + [
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int]
        lib.rtp_load_cube.restype = ctypes.c_int
        lib.rtp_load_cube_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long] + [
            ctypes.c_long] * 6 + [
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
            ctypes.c_int]
        lib.rtp_load_cube_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def probe(path: str):
    """Return (shape tuple, dtype char) of a .npy file, or None."""
    lib = get_lib()
    if lib is None:
        return None
    shape = (ctypes.c_long * 4)()
    ndim = ctypes.c_int()
    dt = ctypes.c_char()
    if lib.rtp_probe(path.encode(), shape, ctypes.byref(ndim), ctypes.byref(dt)) != 0:
        return None
    return tuple(shape[: ndim.value]), dt.value.decode()


def load_cube(path: str, roi_idx, norm_start: float, norm_scale: float,
              doppler_bins: int, out_zyx, channels_last: bool = True
              ) -> Optional[np.ndarray]:
    """Fused load+crop+normalize; returns (Z', Y', X', D) f32 or None."""
    lib = get_lib()
    if lib is None:
        return None
    z0, z1, y0, y1, x0, x1 = (int(v) for v in roi_idx)
    zo, yo, xo = out_zyx
    out = np.empty((zo, yo, xo, doppler_bins) if channels_last
                   else (doppler_bins, zo, yo, xo), np.float32)
    rc = lib.rtp_load_cube(
        path.encode(), z0, z1, y0, y1, x0, x1,
        float(norm_start), float(norm_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
        1 if channels_last else 0)
    return out if rc == 0 else None


def load_cube_batch(paths: Sequence[str], roi_idx, norm_start: float,
                    norm_scale: float, doppler_bins: int, out_zyx,
                    nthreads: int = 4) -> Optional[np.ndarray]:
    """(B, Z', Y', X', D) fused batch load with a C++ thread pool."""
    lib = get_lib()
    if lib is None:
        return None
    z0, z1, y0, y1, x0, x1 = (int(v) for v in roi_idx)
    zo, yo, xo = out_zyx
    n = len(paths)
    out = np.empty((n, zo, yo, xo, doppler_bins), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.rtp_load_cube_batch(
        arr, n, z0, z1, y0, y1, x0, x1, float(norm_start), float(norm_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out[0].size, 1, int(nthreads))
    return out if rc == 0 else None
