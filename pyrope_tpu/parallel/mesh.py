"""Device mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"    # corpus-row sharding axis
BATCH_AXIS = "batch"  # query-batch sharding axis (2-D meshes)


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"asked for {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(batch: int, data: int) -> Mesh:
    """2-D (batch × data) mesh: queries sharded over ``batch``, corpus rows
    over ``data``."""
    devs = jax.devices()
    if batch * data > len(devs):
        raise ValueError(f"asked for {batch}x{data} devices, have {len(devs)}")
    arr = np.array(devs[: batch * data]).reshape(batch, data)
    return Mesh(arr, (BATCH_AXIS, DATA_AXIS))


def default_mesh() -> Mesh:
    return make_mesh()


def allgather_merge_topk(vals, gidx, k: int, axis: str = DATA_AXIS):
    """The sharded-scan merge tail, shared by every shard_map'd search
    maker: all-gather the [B, k] per-shard candidate lists over ``axis``
    (tiny ICI payload) and reduce to the final top-k on every shard.
    Missing hits follow the masked_topk convention (-inf score, id -1)."""
    import jax.numpy as jnp

    vals_all = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
    gidx_all = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
    mvals, pos = jax.lax.top_k(vals_all, k)
    mids = jnp.take_along_axis(gidx_all, pos, axis=1)
    return mvals, jnp.where(jnp.isfinite(mvals), mids, -1)
