"""ctypes bindings for the native host kernels (native/ocmg_native.cpp).

Lazy-loads ``native/libocmg_native.so`` (built by ``make -C native``; an
automatic build is attempted on first use). All callers fall back to the
pure-Python implementations when the library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libocmg_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.chu_liu_edmonds_path.restype = ctypes.c_int
        lib.chu_liu_edmonds_path.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int)]
        lib.solve_lap.restype = None
        lib.solve_lap.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.greedy_spaced_select.restype = ctypes.c_int
        lib.greedy_spaced_select.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_int)]
        lib.filter_near_duplicates.restype = ctypes.c_int
        lib.filter_near_duplicates.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def edmonds_longest_path(d2: np.ndarray, big: float) -> list[int] | None:
    """Min spanning arborescence (virtual root) + longest path over a dense
    directed cost matrix. Returns node order or None if unavailable/failed."""
    lib = _load()
    if lib is None:
        return None
    n = d2.shape[0]
    d2 = np.ascontiguousarray(d2, dtype=np.float64)
    out = np.zeros(n, dtype=np.int32)
    length = lib.chu_liu_edmonds_path(
        d2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        ctypes.c_double(big),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if length <= 0:
        return None
    return out[:length].tolist()


def greedy_spaced_select(pts: np.ndarray, distance: float) -> np.ndarray | None:
    """Indices of the greedy equal-spacing walk (first row always kept);
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    n, d = pts.shape
    out = np.zeros(max(n, 1), dtype=np.int32)
    count = lib.greedy_spaced_select(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, d,
        ctypes.c_double(distance),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out[:count].astype(np.int64)


def filter_near_duplicates(rows: np.ndarray, threshold: float,
                           max_removed: int) -> np.ndarray | None:
    """Indices removed by the greedy nearest-duplicate suppression;
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.float64)
    n, d = rows.shape
    out = np.zeros(max(n, 1), dtype=np.int32)
    count = lib.filter_near_duplicates(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, d,
        ctypes.c_double(threshold), int(max_removed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out[:count].astype(np.int64)


def solve_lap(cost: np.ndarray) -> np.ndarray | None:
    """JV LAP: returns row4col (n_cols,) or None if unavailable.

    Requires n_rows >= n_cols (the C++ kernel pads rows, not columns);
    returns None otherwise so callers fall back to scipy.
    """
    lib = _load()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n_rows, n_cols = cost.shape
    if n_rows < n_cols:
        return None
    out = np.zeros(n_cols, dtype=np.int32)
    lib.solve_lap(cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                  n_rows, n_cols,
                  out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out.astype(np.int64)
