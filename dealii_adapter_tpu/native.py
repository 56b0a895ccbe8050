"""ctypes loader for the C++ native runtime helpers (csrc/dat_native.cpp).

Builds the shared library on first use if a toolchain is available (cmake +
ninja or make); every entry point has a pure-numpy fallback so the package
works without a compiler. The native path is the setup-time fast path for
large meshes (O(n) plan building vs numpy's O(n log n) sort) and the output
fast path (base64 for multi-hundred-MB VTU snapshots).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_PKG_DIR, "_native", "libdat_native.so")
_CSRC = os.path.normpath(os.path.join(_PKG_DIR, "..", "csrc"))


def _build() -> bool:
    build_dir = os.path.join(_CSRC, "build")
    os.makedirs(build_dir, exist_ok=True)
    try:
        subprocess.run(
            ["cmake", "-G", "Ninja", ".."],
            cwd=build_dir, check=True, capture_output=True,
        )
        subprocess.run(
            ["ninja"], cwd=build_dir, check=True, capture_output=True
        )
        return os.path.exists(_SO_PATH)
    except (OSError, subprocess.CalledProcessError) as e:  # no toolchain
        print(f"dat_native build skipped: {e}", file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first call; None if
    unavailable (callers fall back to numpy)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and os.path.isdir(_CSRC):
        _build()
    if os.path.exists(_SO_PATH):
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:  # stale/incompatible binary -> numpy fallback
            print(f"dat_native load skipped: {e}", file=sys.stderr)
            return None
        lib.dat_valence.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.dat_fill_plan.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dat_fill_plan.restype = ctypes.c_int64
        lib.dat_b64.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_char),
        ]
        lib.dat_b64.restype = ctypes.c_int64
        lib.dat_unique_sorted.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dat_unique_sorted.restype = ctypes.c_int64
        _LIB = lib
    return _LIB


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def build_plan_native(cells: np.ndarray, n_nodes: int):
    """Native transpose-gather plan build; returns (plan int32
    (n_nodes, maxval), sentinel) or None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    flat = np.ascontiguousarray(cells.reshape(-1), dtype=np.int32)
    n_inc = flat.size
    counts = np.empty(n_nodes, dtype=np.int64)
    lib.dat_valence(_ptr(flat, ctypes.c_int32), n_inc, n_nodes,
                    _ptr(counts, ctypes.c_int64))
    maxval = int(counts.max()) if n_nodes else 1
    sentinel = n_inc
    plan = np.full((n_nodes, maxval), sentinel, dtype=np.int32)
    used = lib.dat_fill_plan(_ptr(flat, ctypes.c_int32), n_inc, n_nodes,
                             maxval, _ptr(plan, ctypes.c_int32))
    assert used == maxval, (used, maxval)
    return plan, sentinel


def b64_native(data: bytes | np.ndarray) -> Optional[str]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8) if isinstance(data, bytes) else (
        np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    )
    n = src.size
    out = ctypes.create_string_buffer(4 * ((n + 2) // 3) + 1)
    m = lib.dat_b64(_ptr(src, ctypes.c_uint8), n, out)
    return out.raw[:m].decode("ascii")


def unique_sorted_native(ids: np.ndarray, n_nodes: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    flat = np.ascontiguousarray(ids.reshape(-1), dtype=np.int32)
    out = np.empty(flat.size, dtype=np.int32)
    m = lib.dat_unique_sorted(_ptr(flat, ctypes.c_int32), flat.size, n_nodes,
                              _ptr(out, ctypes.c_int32))
    return out[:m].copy()
