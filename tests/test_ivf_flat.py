"""IvfFlatIndex tests (mirrors Vector/IvfFlatVectorIndexTests.cs:22-95:
clustering correctness, centroids-after-build, buffer-search-before-build,
plus recall/maxscans/nprobe behavior)."""

import numpy as np
import pytest

from pyrope_tpu import IvfFlatIndex, Metric, SearchOptions
from pyrope_tpu.utils.datasets import ground_truth, recall_at_k, synthetic


def built_index(n=2000, dim=16, nlist=20, metric=Metric.L2, seed=0):
    base = synthetic(n, dim, seed=seed)
    idx = IvfFlatIndex(dim, metric, nlist=nlist)
    idx.add_batch([str(i) for i in range(n)], base)
    idx.build()
    return idx, base


def test_buffer_search_before_build():
    idx = IvfFlatIndex(8, nlist=4)
    vecs = synthetic(20, 8)
    idx.add_batch([str(i) for i in range(20)], vecs)
    hits = idx.search(vecs[13], 3)
    assert hits[0].id == "13"
    assert idx.get_centroids() is None


def test_centroids_after_build():
    idx, _ = built_index(n=300, nlist=10)
    cents = idx.get_centroids()
    assert cents is not None and cents.shape == (10, 16)


def test_exact_hit_after_build():
    idx, base = built_index()
    hits = idx.search(base[700], 1)
    assert hits[0].id == "700"
    assert hits[0].score == pytest.approx(0.0, abs=1e-3)


def test_recall_at_full_probe_is_exact():
    idx, base = built_index(n=1000, nlist=10)
    q = synthetic(16, 16, seed=9)
    truth = ground_truth(base, q, 10, "L2")
    res = idx.search_batch(q, 10, SearchOptions(nprobe=10))
    ids = np.array([[int(h.id) for h in hits] + [-1] * (10 - len(hits)) for hits in res])
    assert recall_at_k(ids, truth, 10) == 1.0


def test_default_nprobe_recall_reasonable():
    idx, base = built_index(n=2000, nlist=20)
    q = synthetic(32, 16, seed=11)
    truth = ground_truth(base, q, 10, "L2")
    res = idx.search_batch(q, 10)
    ids = np.array([[int(h.id) for h in hits] + [-1] * (10 - len(hits)) for hits in res])
    assert recall_at_k(ids, truth, 10) >= 0.5  # nprobe=3/20 lists


def test_writes_after_build_go_to_buffer_and_win():
    idx, base = built_index(n=500, nlist=8)
    nv = np.full(16, 0.5, np.float32)
    idx.add("new", nv)
    hits = idx.search(nv, 1)
    assert hits[0].id == "new"
    # upsert of an existing main id: buffer copy supersedes the main copy
    idx.upsert("42", nv * -1.0)
    hits = idx.search(nv * -1.0, 1)
    assert hits[0].id == "42"
    assert idx.get_stats().count == 501


def test_delete_from_main_and_buffer():
    idx, base = built_index(n=300, nlist=8)
    assert idx.delete("100")
    assert all(h.id != "100" for h in idx.search(base[100], 10))
    idx.add("tmp", np.ones(16, np.float32))
    assert idx.delete("tmp")
    assert not idx.delete("tmp")
    assert idx.get_stats().count == 299


def test_max_scans_budget():
    idx, base = built_index(n=1000, nlist=10)
    # max_scans=0 -> nothing from the main lists
    hits = idx.search(base[0], 5, SearchOptions(max_scans=0))
    assert hits == []


def test_build_merges_buffer_into_lists():
    idx, base = built_index(n=400, nlist=8)
    extra = synthetic(50, 16, seed=77) + 2.0
    for i, v in enumerate(extra):
        idx.add(f"x{i}", v)
    idx.build()
    assert idx._buffer.get_stats().count == 0
    assert idx.get_stats().count == 450
    hits = idx.search(extra[7], 1)
    assert hits[0].id == "x7"


def test_snapshot_load_roundtrip(tmp_path):
    idx, base = built_index(n=300, nlist=8)
    idx.delete("5")
    idx.add("buffered", np.full(16, 3.0, np.float32))
    p = str(tmp_path / "ivf.npz")
    idx.snapshot(p)
    fresh = IvfFlatIndex(16)
    fresh.load(p)
    assert fresh.get_stats().count == 300  # 299 main + 1 buffer
    assert fresh.search(base[10], 1)[0].id == "10"
    assert fresh.search(np.full(16, 3.0, np.float32), 1)[0].id == "buffered"
    assert all(h.id != "5" for h in fresh.search(base[5], 10))


def test_cosine_ivf():
    idx, base = built_index(n=500, nlist=8, metric=Metric.COSINE)
    hits = idx.search(base[123] * 5.0, 1)  # scale-invariant
    assert hits[0].id == "123"
    assert hits[0].score == pytest.approx(1.0, abs=1e-3)
