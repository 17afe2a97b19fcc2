"""Device mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"    # corpus-row sharding axis (ICI within a slice)
BATCH_AXIS = "batch"  # query-batch sharding axis (2-D meshes)
SLICE_AXIS = "slice"  # cross-slice axis of a multi-slice mesh (DCN links)


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


def make_mesh_multislice(n_slices: int, per_slice: int | None = None) -> Mesh:
    """2-D (slice × data) mesh for multi-slice deployments (SURVEY §5.8):
    ``data`` neighbors share ICI inside a slice; ``slice`` crosses slices
    over DCN. Corpus rows shard over BOTH axes; collective schedules must
    keep big payloads on ``data`` and send only reduced [B, k]-sized lists
    across ``slice`` (see hierarchical_merge_topk).

    On real multi-slice hardware devices are grouped by their
    ``slice_index`` attribute so the axes map to the physical links. On a
    single slice or the CPU-virtual mesh the grouping is synthetic, but the
    compiled program — shardings, collective order, per-axis payload sizes
    — is exactly what runs on DCN-connected slices, which is what the
    dryrun validates."""
    devs = jax.devices()
    if per_slice is None:
        if len(devs) % n_slices:
            raise ValueError(f"{len(devs)} devices not divisible by {n_slices} slices")
        per_slice = len(devs) // n_slices
    if n_slices * per_slice > len(devs):
        raise ValueError(
            f"asked for {n_slices}x{per_slice} devices, have {len(devs)}"
        )
    groups: dict[int, list] = {}
    for d in devs:
        groups.setdefault(getattr(d, "slice_index", 0), []).append(d)
    if len(groups) >= n_slices and all(
        len(g) >= per_slice for g in list(groups.values())[:n_slices]
    ):
        rows = [g[:per_slice] for g in list(groups.values())[:n_slices]]
        arr = np.array(rows)
    else:  # single physical slice / CPU: synthetic grouping
        arr = np.array(devs[: n_slices * per_slice]).reshape(n_slices, per_slice)
    return Mesh(arr, (SLICE_AXIS, DATA_AXIS))


def row_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes corpus rows shard over: (slice, data) on a multi-slice
    mesh, (data,) otherwise. Slice-major so a shard's rows are contiguous
    in the global order (base arithmetic in the scan kernels)."""
    return (
        (SLICE_AXIS, DATA_AXIS)
        if SLICE_AXIS in mesh.axis_names
        else (DATA_AXIS,)
    )


def row_shard_count(mesh: Mesh) -> int:
    """Number of row shards = product of the row-axis sizes."""
    n = 1
    for a in row_axes(mesh):
        n *= int(mesh.shape[a])
    return n


def flat_row_shard_index(mesh: Mesh):
    """Inside a shard_map body: this device's flattened row-shard index
    (slice-major, matching ``row_axes`` order)."""
    axes = row_axes(mesh)
    idx = jax.lax.axis_index(axes[0])
    for a in axes[1:]:
        idx = idx * int(mesh.shape[a]) + jax.lax.axis_index(a)
    return idx


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


def hierarchical_merge_topk(vals, gidx, k: int, mesh: Mesh):
    """Multi-slice merge tail: reduce over the INNERMOST (ICI) row axis
    first, then over the slice (DCN) axis — after the ICI stage every
    device in a slice holds the identical slice-local top-k, so the DCN
    all-gather carries ONE [B, k] list per slice instead of one per chip
    (1/per_slice the cross-slice traffic of a flat merge). On a 1-D mesh
    this degenerates to the plain allgather_merge_topk."""
    for a in reversed(row_axes(mesh)):
        vals, gidx = allgather_merge_topk(vals, gidx, k, axis=a)
    return vals, gidx
