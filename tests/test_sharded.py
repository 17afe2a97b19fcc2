"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pyrope_tpu import FlatIndex, Metric, SearchOptions
from pyrope_tpu.ops.kmeans import kmeans_train
from pyrope_tpu.parallel import ShardedFlatIndex, make_mesh, sharded_kmeans_step
from pyrope_tpu.parallel.mesh import DATA_AXIS
from pyrope_tpu.utils.datasets import synthetic


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_flat_matches_single_device():
    base = synthetic(2000, 32)
    q = synthetic(16, 32, seed=5)
    ref = FlatIndex(32)
    ref.add_batch([str(i) for i in range(2000)], base)
    sh = ShardedFlatIndex(32, mesh=make_mesh())
    sh.add_batch([str(i) for i in range(2000)], base)
    r1 = ref.search_batch(q, 10)
    r2 = sh.search_batch(q, 10)
    for a, b in zip(r1, r2):
        assert [h.id for h in a] == [h.id for h in b]
        np.testing.assert_allclose(
            [h.score for h in a], [h.score for h in b], rtol=1e-5, atol=1e-5
        )


def test_sharded_flat_delete_and_maxscans():
    base = synthetic(500, 16)
    sh = ShardedFlatIndex(16)
    sh.add_batch([str(i) for i in range(500)], base)
    sh.delete("123")
    hits = sh.search(base[123], 5)
    assert all(h.id != "123" for h in hits)
    hits = sh.search(base[400], 3, SearchOptions(max_scans=50))
    assert all(int(h.id) < 50 for h in hits)


def test_sharded_flat_metrics():
    base = synthetic(300, 16)
    for metric in (Metric.INNER_PRODUCT, Metric.COSINE):
        sh = ShardedFlatIndex(16, metric)
        sh.add_batch([str(i) for i in range(300)], base)
        ref = FlatIndex(16, metric)
        ref.add_batch([str(i) for i in range(300)], base)
        q = synthetic(4, 16, seed=3)
        a = sh.search_batch(q, 5)
        b = ref.search_batch(q, 5)
        for x, y in zip(a, b):
            assert [h.id for h in x] == [h.id for h in y]


def test_sharded_kmeans_step_matches_host():
    mesh = make_mesh()
    x = synthetic(1024, 16)
    cents0 = x[:8].copy()
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(DATA_AXIS, None)))
    vs = jax.device_put(jnp.ones(1024, bool), NamedSharding(mesh, P(DATA_AXIS)))
    cs = jnp.asarray(cents0)
    out = np.asarray(
        sharded_kmeans_step(xs, vs, cs, metric=Metric.L2, mesh=mesh)
    )
    # host reference: one Lloyd iteration
    d2 = ((x[:, None, :] - cents0[None, :, :]) ** 2).sum(-1)
    assign = d2.argmin(1)
    expect = np.stack([
        x[assign == j].mean(0) if (assign == j).any() else cents0[j]
        for j in range(8)
    ])
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)
