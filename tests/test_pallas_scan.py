"""Pallas fused scan+top-k kernel (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyrope_tpu.ops.pallas_scan import pallas_flat_topk
from pyrope_tpu.types import Metric


def ref_topk(q, x, sq, alive, ms, k, metric):
    dots = q @ x.T
    if metric == Metric.L2:
        scores = -np.maximum((q * q).sum(1)[:, None] - 2 * dots + sq[None, :], 0)
    else:
        scores = dots
    mask = alive & (np.arange(x.shape[0]) < ms)
    scores = np.where(mask[None, :], scores, -np.inf)
    idx = np.argsort(-scores, axis=1)[:, :k]
    return scores, idx


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT])
def test_exact_vs_numpy(metric):
    rng = np.random.default_rng(0)
    n, b, d, k = 4096, 64, 32, 10
    x = rng.random((n, d), np.float32)
    q = rng.random((b, d), np.float32)
    sq = np.einsum("nd,nd->n", x, x).astype(np.float32)
    alive = np.ones(n, bool)
    alive[7:50] = False
    ms = 4000
    vals, idx = pallas_flat_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        ms, k, metric,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    scores, ref_idx = ref_topk(q, x, sq, alive, ms, k, metric)
    for bi in range(b):
        assert set(idx[bi]) == set(ref_idx[bi])
    assert np.allclose(vals, np.take_along_axis(scores, idx, axis=1),
                       rtol=1e-4, atol=1e-4)


def test_fewer_live_than_k_reports_minus_one():
    rng = np.random.default_rng(1)
    n, b, d, k = 1024, 64, 16, 10
    x = rng.random((n, d), np.float32)
    q = rng.random((b, d), np.float32)
    sq = np.einsum("nd,nd->n", x, x).astype(np.float32)
    alive = np.zeros(n, bool)
    alive[:3] = True  # only 3 live rows
    vals, idx = pallas_flat_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        n, k, Metric.L2,
    )
    idx = np.asarray(idx)
    assert set(idx[0][:3]) == {0, 1, 2}
    assert all(i == -1 for i in idx[0][3:])


def test_shape_validation():
    with pytest.raises(ValueError):  # 3000 not divisible by clamped tile
        pallas_flat_topk(
            jnp.zeros((64, 8)), jnp.zeros((3000, 8)), jnp.zeros(3000),
            jnp.ones(3000, bool), 3000, 5, Metric.L2, row_tile=2048,
        )
    with pytest.raises(ValueError):
        pallas_flat_topk(
            jnp.zeros((64, 8)), jnp.zeros((1024, 8)), jnp.zeros(1024),
            jnp.ones(1024, bool), 1024, 5, Metric.COSINE,
        )


def test_flat_index_pallas_selection():
    rng = np.random.default_rng(2)
    from pyrope_tpu.index.flat import FlatIndex

    n, d = 3000, 16
    vecs = rng.random((n, d), np.float32)
    exact = FlatIndex(d, "L2")
    pall = FlatIndex(d, "L2", selection="pallas")
    ids = [str(i) for i in range(n)]
    exact.add_batch(ids, vecs)
    pall.add_batch(ids, vecs)
    q = rng.random((5, d), np.float32)
    r1 = exact.search_batch(q, 10)
    r2 = pall.search_batch(q, 10)
    assert [[h.id for h in row] for row in r1] == [[h.id for h in row] for row in r2]
    # delete + max_scans also flow through the kernel
    pall.delete("42")
    hits = pall.search(vecs[42], 5)
    assert all(h.id != "42" for h in hits)
