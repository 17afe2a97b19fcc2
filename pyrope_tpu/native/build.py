"""Lazy ctypes build/load of the native library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_SRC_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SOURCES = ["hnsw_builder.cc"]
_LIB_NAME = "libpyrope_native.so"

_lock = threading.Lock()
_lib: "Optional[ctypes.CDLL]" = None
_tried = False


def _build_dir() -> Path:
    d = os.environ.get("PYROPE_NATIVE_BUILD_DIR")
    if d:
        return Path(d)
    return _SRC_DIR / "build"


def _compile() -> Optional[Path]:
    out_dir = _build_dir()
    out_dir.mkdir(parents=True, exist_ok=True)
    lib_path = out_dir / _LIB_NAME
    srcs = [_SRC_DIR / s for s in _SOURCES]
    if not all(s.exists() for s in srcs):
        return None
    newest_src = max(s.stat().st_mtime for s in srcs)
    if lib_path.exists() and lib_path.stat().st_mtime >= newest_src:
        return lib_path
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17",
        "-shared", "-fPIC",
        "-o", str(lib_path),
    ] + [str(s) for s in srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None
    return lib_path


def load_native() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PYROPE_DISABLE_NATIVE"):
            return None
        path = _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            return None
        lib.hnsw_build.restype = ctypes.c_int
        lib.hnsw_build.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # vecs
            ctypes.POINTER(ctypes.c_float),   # sqnorm
            ctypes.c_int, ctypes.c_int,       # n, dim
            ctypes.c_int, ctypes.c_int,       # m, ef_construction
            ctypes.c_int,                     # metric
            ctypes.c_int,                     # heuristic (0 = ref closest-M)
            ctypes.POINTER(ctypes.c_int32),   # levels
            ctypes.c_int,                     # max_level
            ctypes.POINTER(ctypes.c_int32),   # adj0
            ctypes.POINTER(ctypes.c_int32),   # adj_up
            ctypes.POINTER(ctypes.c_int32),   # top_level_out
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_native() is not None
