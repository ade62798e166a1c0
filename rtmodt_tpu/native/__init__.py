"""Native (C++) host-side components with pure-Python fallbacks.

The reference's hot host-side math lives in third-party C++ (``lap`` LAPJV,
OpenCV geometry - SURVEY.md 2.2).  This package holds the framework's own
native code, built on demand with g++ and loaded via ctypes:

  * ``liblapjv`` - Jonker-Volgenant optimal linear assignment (cost_limit
    semantics compatible with ``lap.lapjv``), used by the host tracker and as
    the test arbiter for the on-device greedy matcher.

Build: ``python -m rtmodt_tpu.native.build`` (done automatically on first
import; falls back to scipy's Hungarian solver if no compiler is available).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from rtmodt_tpu.utils.logging import logger

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "liblapjv.so")
_lib: ctypes.CDLL | None = None
_tried_build = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried_build
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _tried_build:
        _tried_build = True
        try:
            from rtmodt_tpu.native.build import build_all
            build_all()
        except Exception as e:  # no compiler / sandbox
            logger.warning(f"native build failed ({e}); using scipy fallback")
    if os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lapjv_solve.restype = ctypes.c_double
        lib.lapjv_solve.argtypes = [
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_double,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    return _lib


_fp_lib: ctypes.CDLL | None = None


def _load_framepack() -> ctypes.CDLL | None:
    global _fp_lib, _tried_build
    if _fp_lib is not None:
        return _fp_lib
    path = os.path.join(_DIR, "libframepack.so")
    if not os.path.exists(path) and not _tried_build:
        _tried_build = True
        try:
            from rtmodt_tpu.native.build import build_all
            build_all()
        except Exception as e:
            logger.warning(f"native build failed ({e})")
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.pack_i420_chunk.restype = None
        lib.pack_i420_chunk.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        _fp_lib = lib
    return _fp_lib


def pack_i420_chunk_native(frames: np.ndarray, ch: int, cw: int,
                           num_threads: int = 0, out=None):
    """C++ chunk packer: (N, H, W, 3) BGR -> planar (y, u, v) uint8 arrays.

    Resize + BT.601 conversion for the whole chunk in one GIL-free native
    call (AVX-512 fused path for 2x downsamples, point-sampling for odd
    integer factors, scalar bilinear otherwise; multithreaded across
    frames). Returns None if the native lib is unavailable (callers fall
    back to the cv2 per-frame path).
    """
    if ch % 2 or cw % 2:
        # I420 needs even content dims; the scalar path's chroma loop would
        # read/write one element past the row on odd widths
        raise ValueError(f"content dims must be even for I420, got {ch}x{cw}")
    lib = _load_framepack()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = frames.shape[:3]
    if out is None:
        out = (np.empty((n, ch, cw), np.uint8),
               np.empty((n, ch // 2, cw // 2), np.uint8),
               np.empty((n, ch // 2, cw // 2), np.uint8))
    y, u, v = out
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 4)
    lib.pack_i420_chunk(frames, n, h, w, ch, cw, y, u, v, num_threads)
    return y, u, v


def native_pack_wins(src_h: int, src_w: int, ch: int, cw: int) -> bool:
    """True when the native packer's fast paths apply to this geometry
    (exact integer downsample; for the 2x AVX path the content width must
    be SIMD-block aligned).  Otherwise cv2's resize+cvtColor is faster
    than the native scalar fallback."""
    if ch <= 0 or cw <= 0 or src_h % ch or src_w % cw:
        return False
    s = src_h // ch
    if s != src_w // cw:
        return False
    return bool(s & 1) or (s == 2 and cw % 32 == 0)


def lapjv(cost: np.ndarray, cost_limit: float = np.inf) -> np.ndarray:
    """Solve min-cost assignment; returns row->col (-1 = unassigned).

    Matches ``lap.lapjv(cost, extend_cost=True, cost_limit=...)`` semantics
    (the reference's production path, tracker.py:170): rectangular matrices
    are padded, and assignments costing more than ``cost_limit`` are refused.
    """
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    r, c = cost.shape
    if r == 0 or c == 0:
        return np.full(r, -1, np.int32)
    lib = _load()
    if lib is not None:
        row_to_col = np.empty(r, np.int32)
        col_to_row = np.empty(c, np.int32)
        lib.lapjv_solve(r, c, cost, float(cost_limit), row_to_col, col_to_row)
        return row_to_col
    return _scipy_lapjv(cost, cost_limit)


def _scipy_lapjv(cost: np.ndarray, cost_limit: float) -> np.ndarray:
    """Optimal fallback via scipy Hungarian with cost_limit emulation.

    cost_limit is emulated the same way ``lap`` does it internally: augment to
    a (r+c) x (r+c) problem where skipping a row/col costs cost_limit / 2.
    """
    from scipy.optimize import linear_sum_assignment

    r, c = cost.shape
    if np.isfinite(cost_limit):
        big = np.full((r + c, r + c), cost_limit / 2.0, dtype=np.float64)
        big[:r, :c] = cost
        big[r:, c:] = 0.0
        rows, cols = linear_sum_assignment(big)
        row_to_col = np.full(r, -1, np.int32)
        for i, j in zip(rows, cols):
            if i < r and j < c:
                row_to_col[i] = j
        return row_to_col
    rows, cols = linear_sum_assignment(cost)
    row_to_col = np.full(r, -1, np.int32)
    row_to_col[rows] = cols
    return row_to_col
