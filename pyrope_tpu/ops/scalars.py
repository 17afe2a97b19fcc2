"""Device-resident scalar cache.

Every ``jnp.int32(v)`` constructed per query is a fresh host→device
transfer; on a tunneled TPU that transfer serializes the dispatch pipeline
(measured: flat100k_approx 16.5k → >100k QPS once removed). Search-time
scalars (max_scans, entry points, nprobe) take a handful of distinct
values, so cache them on device by value.
"""

from __future__ import annotations

import threading

import jax.numpy as jnp

_CACHE: dict[int, "jnp.ndarray"] = {}
_LOCK = threading.Lock()
_MAX_ENTRIES = 4096


def device_i32(value: int):
    """A cached device int32 scalar for `value`."""
    v = int(value)
    got = _CACHE.get(v)
    if got is not None:
        return got
    arr = jnp.int32(v)
    with _LOCK:
        if len(_CACHE) >= _MAX_ENTRIES:
            _CACHE.clear()
        _CACHE[v] = arr
    return arr


_VEC_CACHE: dict[int, "jnp.ndarray"] = {}


def device_i32x1(value: int):
    """A cached device int32 [1]-vector (SMEM scalar inputs to Pallas
    kernels take rank-1 refs)."""
    v = int(value)
    got = _VEC_CACHE.get(v)
    if got is not None:
        return got
    arr = jnp.asarray([v], jnp.int32)
    with _LOCK:
        if len(_VEC_CACHE) >= _MAX_ENTRIES:
            _VEC_CACHE.clear()
        _VEC_CACHE[v] = arr
    return arr
