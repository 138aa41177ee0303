"""ctypes bindings for the C++ runtime pieces (`native/line_mesh.cpp`).

Auto-builds the shared library on first import if g++ is available; every
caller has a pure-numpy fallback, so the native path is an optimisation, not
a requirement.
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.normpath(os.path.join(_HERE, "..", "..", "native"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtendrils_native.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # pragma: no cover
            raise ImportError(f"native build failed: {e}")
    lib = ctypes.CDLL(_LIB_PATH)

    lib.tendrils_polyline_normals.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.tendrils_fill_ribbon.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.tendrils_log_rates.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_double, ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def polyline_normals(path, closed=False):
    """Native twin of `geom.polyline_normals` (same contract)."""
    lib = _load()
    path = np.ascontiguousarray(path, np.float64)
    n = path.shape[0]
    normals = np.empty((n, 2), np.float32)
    miters = np.empty(n, np.float32)
    lib.tendrils_polyline_normals(_dptr(path), n, int(bool(closed)),
                                  _fptr(normals), _fptr(miters))
    return normals, miters


def fill_ribbon(path, times, rad, speed):
    """Expand a timestamped path into strip vertices + per-point velocities
    (the FlowLine per-frame attribute fill)."""
    lib = _load()
    path = np.ascontiguousarray(path, np.float64)
    times = np.ascontiguousarray(times, np.float64)
    n = path.shape[0]
    verts = np.empty((n * 2, 2), np.float32)
    vels = np.empty((n, 2), np.float32)
    lib.tendrils_fill_ribbon(_dptr(path), _dptr(times), n, float(rad),
                             float(speed), _fptr(verts), _fptr(vels))
    return verts, vels


def log_rates(last, current, dt, out=None):
    """Native twin of `audio.analyse.log_rates`."""
    lib = _load()
    last = np.ascontiguousarray(last, np.float32)
    current = np.ascontiguousarray(current, np.float32)
    if out is None:
        out = np.empty_like(current)
    lib.tendrils_log_rates(_fptr(last), _fptr(current), last.shape[0],
                           float(dt), _fptr(out))
    return out
