"""DeltaIndex + registry tests (mirrors Vector/DeltaVectorIndexTests.cs and
Services/VectorIndexRegistry semantics)."""

import numpy as np
import pytest

from pyrope_tpu import (
    DeltaIndex,
    FlatIndex,
    HnswIndex,
    IndexConfig,
    IndexParams,
    IvfFlatIndex,
    IvfPqIndex,
    Metric,
    SearchOptions,
    VectorIndexRegistry,
    create_index,
)
from pyrope_tpu.utils.datasets import synthetic


def make_delta(dim=16, tail="ivf"):
    head = FlatIndex(dim)
    if tail == "ivf":
        t = IvfFlatIndex(dim, nlist=8)
    elif tail == "hnsw":
        t = HnswIndex(dim)
    else:
        t = FlatIndex(dim)
    return DeltaIndex(head, t)


def test_writes_go_to_head():
    d = make_delta()
    vecs = synthetic(50, 16)
    d.add_batch([str(i) for i in range(50)], vecs)
    assert d.head.get_stats().count == 50
    assert d.tail.get_stats().count == 0
    assert d.search(vecs[7], 1)[0].id == "7"


def test_compaction_moves_head_to_tail():
    d = make_delta()
    vecs = synthetic(100, 16)
    d.add_batch([str(i) for i in range(100)], vecs)
    d.build()
    assert d.head.get_stats().count == 0
    assert d.tail.get_stats().count == 100
    assert d.get_stats().count == 100
    hits = d.search(vecs[42], 1, SearchOptions(nprobe=8))
    assert hits[0].id == "42"


def test_merged_search_head_wins():
    d = make_delta()
    vecs = synthetic(60, 16)
    d.add_batch([str(i) for i in range(60)], vecs)
    d.build()
    # overwrite id 10 with a new vector -> head copy shadows tail copy
    nv = np.full(16, 4.0, np.float32)
    d.upsert("10", nv)
    hits = d.search(nv, 3, SearchOptions(nprobe=8))
    assert hits[0].id == "10"
    assert hits[0].score == pytest.approx(0.0, abs=1e-3)
    ids = [h.id for h in hits]
    assert len(ids) == len(set(ids))  # no duplicate id in merged results
    assert d.get_stats().count == 60


def test_delete_propagates_to_both():
    d = make_delta()
    vecs = synthetic(40, 16)
    d.add_batch([str(i) for i in range(40)], vecs)
    d.build()
    d.upsert("5", vecs[5] + 0.001)   # lives in both halves now
    assert d.delete("5")
    hits = d.search(vecs[5], 20, SearchOptions(nprobe=8))
    assert all(h.id != "5" for h in hits)


def test_writes_after_compaction():
    d = make_delta()
    vecs = synthetic(50, 16)
    d.add_batch([str(i) for i in range(50)], vecs)
    d.build()
    nv = np.full(16, -2.0, np.float32)
    assert d.add("new", nv)
    assert d.search(nv, 1)[0].id == "new"
    assert not d.add("7", vecs[7])   # still a duplicate (lives in tail)
    assert d.get_stats().count == 51


def test_snapshot_load_roundtrip(tmp_path):
    d = make_delta()
    vecs = synthetic(80, 16)
    d.add_batch([str(i) for i in range(80)], vecs)
    d.build()
    d.add("extra", np.full(16, 2.5, np.float32))
    p = str(tmp_path / "delta.manifest")
    d.snapshot(p)
    fresh = make_delta()
    fresh.load(p)
    assert fresh.get_stats().count == 81
    assert fresh.search(vecs[33], 1, SearchOptions(nprobe=8))[0].id == "33"
    assert fresh.search(np.full(16, 2.5, np.float32), 1)[0].id == "extra"


def test_hnsw_tail_compaction():
    d = make_delta(tail="hnsw")
    vecs = synthetic(120, 16)
    d.add_batch([str(i) for i in range(120)], vecs)
    d.build()
    hits = d.search(vecs[99], 1, SearchOptions(ef_search=50))
    assert hits[0].id == "99"


def test_centroids_forwarded_from_tail():
    d = make_delta()
    vecs = synthetic(100, 16)
    d.add_batch([str(i) for i in range(100)], vecs)
    assert d.get_centroids() is None
    d.build()
    assert d.get_centroids().shape == (8, 16)


# ---- registry -------------------------------------------------------------


def test_create_index_algorithms():
    for algo, tail_t in [
        ("HNSW", HnswIndex),
        ("IVF_PQ", IvfPqIndex),
        ("IVF_FLAT", IvfFlatIndex),
        ("FLAT", FlatIndex),
    ]:
        cfg = IndexConfig(dim=16, algorithm=algo, params=IndexParams(pq_m=4))
        d = create_index(cfg)
        assert isinstance(d, DeltaIndex)
        assert isinstance(d.head, FlatIndex)
        assert isinstance(d.tail, tail_t)


def test_registry_get_or_create_validates():
    reg = VectorIndexRegistry()
    st = reg.get_or_create("t1", "idx", 16)
    assert st.epoch == 0
    same = reg.get_or_create("t1", "idx", 16)
    assert same is st
    with pytest.raises(ValueError):
        reg.get_or_create("t1", "idx", 32)
    with pytest.raises(ValueError):
        reg.get_or_create("t1", "idx", 16, Metric.COSINE)


def test_registry_epoch_and_drop():
    reg = VectorIndexRegistry()
    reg.get_or_create("t", "i", 8)
    assert reg.increment_epoch("t", "i") == 1
    assert reg.get_epoch("t", "i") == 1
    assert reg.increment_epoch("missing", "i") == -1
    assert reg.drop("t", "i")
    assert reg.try_get("t", "i") is None


def test_registry_create_duplicate_raises():
    reg = VectorIndexRegistry()
    reg.create("t", "i", IndexConfig(dim=8))
    with pytest.raises(ValueError):
        reg.create("t", "i", IndexConfig(dim=8))


class TestHnswHeadDelta:
    """BASELINE config 5: Delta(head=HNSW, tail=IVF_PQ) via the registry."""

    def test_registry_hnsw_head(self):
        import numpy as np
        from pyrope_tpu.registry import create_index
        from pyrope_tpu.types import IndexConfig
        from pyrope_tpu.index.hnsw import HnswIndex

        cfg = IndexConfig(dim=16, algorithm="IVF_PQ", head_algorithm="HNSW")
        idx = create_index(cfg)
        assert isinstance(idx.head, HnswIndex)
        rng = np.random.default_rng(0)
        vecs = rng.random((300, 16), dtype=np.float32)
        idx.add_batch([f"v{i}" for i in range(300)], vecs)
        # streaming adds live in the HNSW head, searchable pre-compaction
        hits = idx.search(vecs[7], 3)
        assert hits[0].id == "v7"
        idx.build()  # compaction into IVF-PQ tail
        hits = idx.search(vecs[7], 3)
        assert any(h.id == "v7" for h in hits)
        # roundtrips through to_dict/from_dict
        assert IndexConfig.from_dict(cfg.to_dict()).head_algorithm == "HNSW"


class TestReviewFixes:
    def test_duplicate_add_never_mutates(self):
        import numpy as np
        import pyrope_tpu as pt

        d = pt.DeltaIndex(pt.FlatIndex(4, "L2"), pt.IvfFlatIndex(4, "L2", nlist=2))
        v1 = np.array([1, 0, 0, 0], np.float32)
        v2 = np.array([0, 1, 0, 0], np.float32)
        v3 = np.array([0, 0, 1, 0], np.float32)
        assert d.add("a", v1)
        d.build()
        d.upsert("a", v2)          # live in head AND tail
        assert not d.add("a", v3)  # duplicate must fail...
        hits = d.search(v2, 1)
        assert hits[0].id == "a" and hits[0].score > -1e-6  # ...and not clobber v2

    def test_overlap_count_o1(self):
        import numpy as np
        import pyrope_tpu as pt

        d = pt.DeltaIndex(pt.FlatIndex(4, "L2"), pt.IvfFlatIndex(4, "L2", nlist=2))
        rng = np.random.default_rng(0)
        vecs = rng.random((20, 4), dtype=np.float32)
        d.add_batch([f"v{i}" for i in range(20)], vecs)
        d.build()
        assert len(d) == 20
        d.upsert("v0", vecs[1])   # overlap = 1
        assert len(d) == 20
        d.delete("v0")
        assert len(d) == 19
        d.build()
        assert len(d) == 19
