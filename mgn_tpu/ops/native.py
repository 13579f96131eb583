"""ctypes bindings to the native (C++) graph-builder library.

Loads ``native/libmgn_native.so`` (building it on first use when a compiler is
available) and exposes the host-side hot-path graph construction; callers fall
back to the NumPy implementations in :mod:`mgn_tpu.core.graph` when the
library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = ["load_library", "available", "cells_to_edges_native",
           "csr_offsets_native", "edge_features_native"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmgn_native.so")


def load_library(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (and, if needed and possible, build) the native library."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.isfile(_SO_PATH) and build:
        try:
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.isfile(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.mgn_cells_to_edges.restype = ctypes.c_int64
    lib.mgn_cells_to_edges.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                                       i32p, i32p]
    lib.mgn_csr_offsets.restype = None
    lib.mgn_csr_offsets.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.mgn_edge_features.restype = None
    lib.mgn_edge_features.argtypes = [f32p, ctypes.c_int32, i32p, i32p,
                                      ctypes.c_int64, f32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load_library() is not None


def _ptr(arr: np.ndarray, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def cells_to_edges_native(cells: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Native cells->edges; returns (senders, receivers) sorted by receiver."""
    lib = load_library()
    assert lib is not None
    cells = np.ascontiguousarray(cells, np.int32)
    ncells, k = cells.shape
    cap = ncells * k * (k - 1)
    senders = np.empty(cap, np.int32)
    receivers = np.empty(cap, np.int32)
    e = lib.mgn_cells_to_edges(_ptr(cells, ctypes.c_int32), ncells, k,
                               _ptr(senders, ctypes.c_int32),
                               _ptr(receivers, ctypes.c_int32))
    return senders[:e].copy(), receivers[:e].copy()


def csr_offsets_native(receivers: np.ndarray, num_nodes: int) -> np.ndarray:
    lib = load_library()
    assert lib is not None
    receivers = np.ascontiguousarray(receivers, np.int32)
    out = np.empty(num_nodes + 1, np.int32)
    lib.mgn_csr_offsets(_ptr(receivers, ctypes.c_int32), len(receivers),
                        num_nodes, _ptr(out, ctypes.c_int32))
    return out


def edge_features_native(mesh_pos: np.ndarray, senders: np.ndarray,
                         receivers: np.ndarray) -> np.ndarray:
    lib = load_library()
    assert lib is not None
    mesh_pos = np.ascontiguousarray(mesh_pos, np.float32)
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    e = len(senders)
    dim = mesh_pos.shape[1]
    out = np.empty((e, dim + 1), np.float32)
    lib.mgn_edge_features(_ptr(mesh_pos, ctypes.c_float), dim,
                          _ptr(senders, ctypes.c_int32),
                          _ptr(receivers, ctypes.c_int32), e,
                          _ptr(out, ctypes.c_float))
    return out
