"""Chunked, pipelined host->device transfers.

Two facts about the dev-TPU environment make the obvious
``jnp.asarray(big_host_array)`` the wrong way to move a corpus:

- The tunnel transfers a monolithic buffer synchronously; splitting the
  upload into ~8 MB `jax.device_put` chunks lets transfers pipeline and
  measured 2-3x faster for a 512 MB slab (interleaved A/B: 7-12 s chunked
  vs 19-40 s monolithic on the same day).
- Host memory is lazily faulted: FIRST-TOUCH of fresh pages runs at
  ~15-30 MB/s while already-touched pages copy at GB/s. Any helper that
  stages through a fresh full-size host buffer (np.pad, astype of the
  whole slab) pays tens of seconds at 1M rows. Chunked per-block
  conversion recycles one small buffer through the allocator instead.

Padding is therefore done device-side (a zeros part in the concatenate),
never via a host ``np.pad`` copy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ~8 MB per chunk: big enough to amortize the ~1.8 ms dispatch cost,
# small enough that the per-chunk conversion buffer stays allocator-hot.
DEFAULT_CHUNK_BYTES = 8 << 20


def upload_rows(
    x: np.ndarray,
    *,
    dtype=None,
    pad_to: Optional[int] = None,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
) -> jax.Array:
    """Upload a row-major [N, ...] host array as pipelined chunks.

    Returns a single device array of shape [pad_to or N, ...] (zero-padded
    rows at the tail), dtype ``dtype`` (default: x.dtype). The result is
    NOT fetched back; callers fence as usual.

    Aliasing: on backends where ``jax.device_put`` is zero-copy (the CPU
    backend), same-dtype chunks may ALIAS the caller's host memory — callers
    must treat ``x`` as frozen until the next sync (index locking already
    guarantees this: slabs are replaced, never written in place, while a
    device view is live).
    """
    x = np.asarray(x)
    n = x.shape[0]
    out_dtype = x.dtype if dtype is None else jnp.dtype(dtype)
    npad = n if pad_to is None else max(int(pad_to), n)
    if n == 0:
        return jnp.zeros((npad,) + x.shape[1:], out_dtype)
    rowbytes = max(x.nbytes // n, 1)
    step = max(int(chunk_bytes) // rowbytes, 1)
    parts = []
    for s in range(0, n, step):
        blk = x[s : s + step]
        if blk.dtype != out_dtype:
            blk = blk.astype(out_dtype)
        parts.append(jax.device_put(blk))
    if npad > n:
        parts.append(jnp.zeros((npad - n,) + x.shape[1:], out_dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)
