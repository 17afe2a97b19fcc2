"""k-means tests (mirrors reference clustering-correctness coverage in
Vector/IvfFlatVectorIndexTests.cs:22-95)."""

import numpy as np

from pyrope_tpu.ops.kmeans import kmeans_assign, kmeans_train
from pyrope_tpu.types import Metric


def three_blobs(n_per=50, dim=8, sep=20.0, seed=0):
    rng = np.random.default_rng(seed)
    centers = np.array([[0.0], [1.0], [2.0]]) * sep
    blobs = []
    for c in range(3):
        blob = rng.normal(size=(n_per, dim)).astype(np.float32)
        blob[:, 0] += centers[c, 0]
        blobs.append(blob)
    return np.concatenate(blobs)


def test_kmeans_separates_blobs():
    x = three_blobs()
    cents = kmeans_train(x, 3, Metric.L2, seed=42)
    assert cents.shape == (3, 8)
    assign = kmeans_assign(x, cents, Metric.L2)
    # each blob maps to a single cluster, all three distinct
    groups = [set(assign[i * 50 : (i + 1) * 50].tolist()) for i in range(3)]
    assert all(len(g) == 1 for g in groups)
    assert len(set().union(*groups)) == 3


def test_k_clipped_to_n():
    x = np.random.default_rng(1).normal(size=(5, 4)).astype(np.float32)
    cents = kmeans_train(x, 100, Metric.L2)
    assert cents.shape == (5, 4)


def test_deterministic_given_seed():
    x = three_blobs(seed=3)
    a = kmeans_train(x, 4, Metric.L2, seed=42)
    b = kmeans_train(x, 4, Metric.L2, seed=42)
    np.testing.assert_array_equal(a, b)


def test_blocked_matches_unblocked():
    x = three_blobs(n_per=40)
    a = kmeans_train(x, 3, Metric.L2, seed=42, block=32)
    b = kmeans_train(x, 3, Metric.L2, seed=42, block=65536)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_cosine_metric_assignment():
    # vectors along distinct directions; cosine k-means should split by angle
    rng = np.random.default_rng(5)
    d1 = np.array([1.0, 0, 0, 0], np.float32)
    d2 = np.array([0, 1.0, 0, 0], np.float32)
    x = np.concatenate([
        d1 * rng.uniform(0.5, 2.0, (30, 1)).astype(np.float32),
        d2 * rng.uniform(0.5, 2.0, (30, 1)).astype(np.float32),
    ]) + rng.normal(scale=0.01, size=(60, 4)).astype(np.float32)
    cents = kmeans_train(x, 2, Metric.COSINE, seed=42)
    assign = kmeans_assign(x, cents, Metric.COSINE)
    assert len(set(assign[:30].tolist())) == 1
    assert len(set(assign[30:].tolist())) == 1
    assert assign[0] != assign[30]


class TestKppInit:
    def test_kpp_deterministic_given_seed(self):
        x = three_blobs()
        a = kmeans_train(x, 3, seed=7, init="kmeans++")
        b = kmeans_train(x, 3, seed=7, init="kmeans++")
        np.testing.assert_array_equal(a, b)

    def test_kpp_separates_blobs(self):
        x = three_blobs()
        cents = kmeans_train(x, 3, init="kmeans++")
        # one centroid per blob: first-coordinate means near 0/20/40
        got = sorted(cents[:, 0])
        assert abs(got[0] - 0) < 3 and abs(got[1] - 20) < 3 and abs(got[2] - 40) < 3

    def test_kpp_differs_from_sample_init(self):
        x = three_blobs(n_per=200, dim=16, sep=2.0, seed=3)
        a = kmeans_train(x, 10, seed=5, init="kmeans++")
        b = kmeans_train(x, 10, seed=5, init="sample")
        assert not np.array_equal(a, b)

    def test_kpp_duplicate_corpus_degenerates_gracefully(self):
        # all-identical rows: D^2 is zero everywhere after the first pick;
        # the sampler must fall back to uniform instead of NaN logits
        x = np.ones((64, 4), np.float32)
        cents = kmeans_train(x, 4, init="kmeans++")
        assert np.isfinite(cents).all()
        np.testing.assert_allclose(cents, 1.0)

    def test_bad_init_raises(self):
        import pytest

        with pytest.raises(ValueError):
            kmeans_train(three_blobs(), 3, init="bogus")
