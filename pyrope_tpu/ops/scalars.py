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
