"""ctypes wrapper for the native HNSW graph builder."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from pyrope_tpu.native.build import load_native


def hnsw_build_native(
    vecs: np.ndarray,      # [n, dim] float32 (cosine rows pre-normalized)
    levels: np.ndarray,    # [n] int32, pre-drawn geometric levels
    m: int,
    ef_construction: int,
    metric_is_l2: bool,
    heuristic: bool = True,
) -> "Optional[tuple[np.ndarray, np.ndarray, int, int]]":
    """Build the full graph natively.

    Returns (adj0 [n, 2m], adj_up [max_level, n, m], entry, top_level),
    or None when the native library is unavailable (caller falls back to
    the Python builder).
    """
    lib = load_native()
    if lib is None:
        return None
    n, dim = vecs.shape
    if n == 0:
        return None
    v = np.ascontiguousarray(vecs, np.float32)
    sq = np.einsum("nd,nd->n", v, v).astype(np.float32)
    lv = np.ascontiguousarray(levels, np.int32)
    max_level = int(lv.max(initial=0))
    adj0 = np.full((n, 2 * m), -1, np.int32)
    adj_up = np.full((max(max_level, 1), n, m), -1, np.int32)
    top_out = np.zeros(1, np.int32)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    entry = lib.hnsw_build(
        v.ctypes.data_as(f32p),
        sq.ctypes.data_as(f32p),
        n, dim, m, ef_construction,
        0 if metric_is_l2 else 1,
        1 if heuristic else 0,
        lv.ctypes.data_as(i32p),
        max_level,
        adj0.ctypes.data_as(i32p),
        adj_up.ctypes.data_as(i32p),
        top_out.ctypes.data_as(i32p),
    )
    return adj0, adj_up[:max_level], int(entry), int(top_out[0])
