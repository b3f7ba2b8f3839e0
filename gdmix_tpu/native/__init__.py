"""Native (C++) acceleration for the host-side data path.

Loads libgdmix_io.so (built from tfrecord_io.cc) via ctypes; builds it with g++
on first use if missing. Falls back to the pure-Python codecs transparently —
`available()` reports which path is active.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgdmix_io.so")
_SRC = os.path.join(_DIR, "tfrecord_io.cc")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.info("native build failed (%s); using pure-python IO", e)
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:  # pragma: no cover
        logger.info("native load failed (%s); using pure-python IO", e)
        return None
    lib.gdx_parse.restype = ctypes.c_void_p
    lib.gdx_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                              ctypes.c_char_p, ctypes.c_char_p]
    lib.gdx_num_records.restype = ctypes.c_int64
    lib.gdx_num_records.argtypes = [ctypes.c_void_p]
    lib.gdx_max_nnz.restype = ctypes.c_int32
    lib.gdx_max_nnz.argtypes = [ctypes.c_void_p]
    lib.gdx_fill_dense.argtypes = [
        ctypes.c_void_p, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
    lib.gdx_fill_dense_i64.argtypes = [
        ctypes.c_void_p, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
    lib.gdx_fill_sparse.argtypes = [
        ctypes.c_void_p, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    lib.gdx_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_per_record(buf: bytes, dense_names: List[str],
                     feature_bag: Optional[str], align: int = 8,
                     int_names: Optional[List[str]] = None
                     ) -> Optional[Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray],
                                         Optional[np.ndarray], Optional[np.ndarray],
                                         Optional[np.ndarray]]]:
    """Decode an in-memory TFRecord buffer.

    Returns (dense_columns, present_flags, indices[N,K], values[N,K], nnz[N]) or
    None if the native path is unavailable/failed. Columns named in int_names
    come back as exact int64; the rest as float64.
    """
    int_names = set(int_names or ())
    lib = _load()
    if lib is None:
        return None
    names_arr = (ctypes.c_char_p * len(dense_names))(
        *[n.encode() for n in dense_names])
    idx_name = f"{feature_bag}_indices".encode() if feature_bag else b""
    val_name = f"{feature_bag}_values".encode() if feature_bag else b""
    h = lib.gdx_parse(buf, len(buf), names_arr, len(dense_names),
                      idx_name, val_name)
    if not h:
        return None
    try:
        n = lib.gdx_num_records(h)
        dense: Dict[str, np.ndarray] = {}
        present: Dict[str, np.ndarray] = {}
        for i, name in enumerate(dense_names):
            flags = np.zeros(n, np.uint8)
            if name in int_names:
                out = np.zeros(n, np.int64)
                if n:
                    lib.gdx_fill_dense_i64(h, i, out, flags)
            else:
                out = np.zeros(n, np.float64)
                if n:
                    lib.gdx_fill_dense(h, i, out, flags)
            dense[name] = out
            present[name] = flags
        indices = values = nnz = None
        if feature_bag:
            k = max(int(lib.gdx_max_nnz(h)), 1)
            k = ((k + align - 1) // align) * align
            indices = np.zeros((n, k), np.int64)
            values = np.zeros((n, k), np.float64)
            nnz = np.zeros(n, np.int32)
            if n:
                lib.gdx_fill_sparse(h, k, indices, values, nnz)
        return dense, present, indices, values, nnz
    finally:
        lib.gdx_free(h)
