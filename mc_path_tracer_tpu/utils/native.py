"""ctypes bindings for the native (C++) runtime components.

The reference's host runtime — BVH construction (BVH.cu), scene assembly —
is native C++; ours keeps that split: `native/bvh.cpp` is built into
libmcpt_native.so (self-compiling on first use via the Makefile) and consumed
here.  A pure-numpy fallback builder keeps the framework functional where no
C++ toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmcpt_native.so")

SAH = 0
MIDDLE = 1
EQUAL_COUNTS = 2
LBVH = 3


@lru_cache(maxsize=1)
def load_native():
    """Load (building if necessary) the native library; None if unavailable."""
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mcpt_bvh_build.restype = ctypes.c_int
    lib.mcpt_bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # tri_bmin
        ctypes.POINTER(ctypes.c_float),  # tri_bmax
        ctypes.c_int,                    # n
        ctypes.c_int,                    # max_leaf
        ctypes.c_int,                    # method
        ctypes.POINTER(ctypes.c_int),    # prim_order
        ctypes.POINTER(ctypes.c_float),  # node_bmin
        ctypes.POINTER(ctypes.c_float),  # node_bmax
        ctypes.POINTER(ctypes.c_int),    # node_first
        ctypes.POINTER(ctypes.c_int),    # node_count
        ctypes.POINTER(ctypes.c_int),    # node_skip
    ]
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def bvh_build_native(
    tri_bmin: np.ndarray,
    tri_bmax: np.ndarray,
    max_leaf: int = 4,
    method: int = SAH,
):
    """Build a threaded BVH with the native builder.

    Returns (bmin [N,3], bmax [N,3], first [N], count [N], skip [N],
    prim_order [T]) as numpy arrays, or None if the native lib is missing.
    """
    lib = load_native()
    if lib is None:
        return None
    n = int(tri_bmin.shape[0])
    tri_bmin = np.ascontiguousarray(tri_bmin, dtype=np.float32)
    tri_bmax = np.ascontiguousarray(tri_bmax, dtype=np.float32)
    cap = 2 * n
    node_bmin = np.empty((cap, 3), np.float32)
    node_bmax = np.empty((cap, 3), np.float32)
    node_first = np.empty(cap, np.int32)
    node_count = np.empty(cap, np.int32)
    node_skip = np.empty(cap, np.int32)
    prim_order = np.empty(n, np.int32)
    n_nodes = lib.mcpt_bvh_build(
        _fptr(tri_bmin),
        _fptr(tri_bmax),
        n,
        max_leaf,
        method,
        _iptr(prim_order),
        _fptr(node_bmin),
        _fptr(node_bmax),
        _iptr(node_first),
        _iptr(node_count),
        _iptr(node_skip),
    )
    if n_nodes < 0:
        return None
    return (
        node_bmin[:n_nodes].copy(),
        node_bmax[:n_nodes].copy(),
        node_first[:n_nodes].copy(),
        node_count[:n_nodes].copy(),
        node_skip[:n_nodes].copy(),
        prim_order,
    )
