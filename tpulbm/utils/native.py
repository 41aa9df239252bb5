"""ctypes loader (and on-demand builder) for the native fast-IO helper.

The shared library is built lazily from native/fastio.cpp with g++ the first
time it is needed and cached next to the source; set TPULBM_NO_NATIVE=1 to
force the pure-NumPy fallback (tests compare the two byte-for-byte).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_native = None
_tried = False


def _repo_native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


class _NativeIO:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.fastio_write_vtk.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, dptr, dptr, dptr, ctypes.c_int64]
        lib.fastio_write_vtk.restype = ctypes.c_int
        lib.fastio_write_velocity_field.argtypes = [
            ctypes.c_char_p, dptr, dptr, dptr, ctypes.c_int64, ctypes.c_int64]
        lib.fastio_write_velocity_field.restype = ctypes.c_int
        try:
            lib.fastio_write_vtk3.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, dptr, dptr, dptr, dptr,
                ctypes.c_int64]
            lib.fastio_write_vtk3.restype = ctypes.c_int
            self._has_vtk3 = True
        except AttributeError:  # stale .so without the 3-D entry point
            self._has_vtk3 = False

    def write_vtk(self, path: str, header: str, ux, uy, rho) -> None:
        rc = self._lib.fastio_write_vtk(
            path.encode(), header.encode(), ux, uy, rho, ux.size)
        if rc != 0:
            raise OSError(f"native VTK write failed: {path}")

    def write_vtk3(self, path: str, header: str, ux, uy, uz, rho) -> None:
        rc = self._lib.fastio_write_vtk3(
            path.encode(), header.encode(), ux, uy, uz, rho, ux.size)
        if rc != 0:
            raise OSError(f"native VTK write failed: {path}")

    def write_velocity_field(self, path: str, ux, uy, rho) -> None:
        ny, nx = ux.shape
        rc = self._lib.fastio_write_velocity_field(
            path.encode(), ux, uy, rho, ny, nx)
        if rc != 0:
            raise OSError(f"native CSV write failed: {path}")


def get_native_io() -> _NativeIO | None:
    """Load (building if needed) the native IO helper; None on any failure."""
    global _native, _tried
    if os.environ.get("TPULBM_NO_NATIVE"):
        return None
    with _lock:
        if _tried:
            return _native
        _tried = True
        ndir = _repo_native_dir()
        src = os.path.join(ndir, "fastio.cpp")
        so = os.path.join(ndir, "libfastio.so")
        if not os.path.exists(src):
            return None
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            if not _build(src, so):
                return None
        try:
            _native = _NativeIO(ctypes.CDLL(so))
        except Exception:
            _native = None
        return _native
