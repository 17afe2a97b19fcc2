"""HnswIndex tests (mirrors Vector/HnswVectorIndexTests.cs:11-80: exact
match, nearest, upsert-on-dup, tombstone delete; plus recall and the
snapshot capability the reference lacks)."""

import numpy as np
import pytest

from pyrope_tpu import HnswIndex, Metric, SearchOptions
from pyrope_tpu.utils.datasets import ground_truth, recall_at_k, synthetic


def built(n=500, dim=16, metric=Metric.L2, **kw):
    base = synthetic(n, dim)
    idx = HnswIndex(dim, metric, **kw)
    for i, v in enumerate(base):
        idx.add(str(i), v)
    return idx, base


def test_exact_match_found():
    idx, base = built(n=200)
    hits = idx.search(base[50], 5, SearchOptions(ef_search=50))
    assert hits[0].id == "50"
    assert hits[0].score == pytest.approx(0.0, abs=1e-3)


def test_nearest_neighbor_quality():
    idx, base = built(n=500)
    q = synthetic(16, 16, seed=5)
    truth = ground_truth(base, q, 10, "L2")
    res = idx.search_batch(q, 10, SearchOptions(ef_search=64))
    ids = np.array([[int(h.id) for h in hits] + [-1] * (10 - len(hits)) for hits in res])
    assert recall_at_k(ids, truth, 10) >= 0.85


def test_upsert_on_duplicate_updates_vector():
    idx, base = built(n=100)
    nv = np.full(16, 5.0, np.float32)
    idx.upsert("30", nv)
    hits = idx.search(nv, 1, SearchOptions(ef_search=50))
    assert hits[0].id == "30"
    assert idx.get_stats().count == 100


def test_tombstone_delete():
    idx, base = built(n=150)
    assert idx.delete("60")
    assert not idx.delete("60")
    hits = idx.search(base[60], 10, SearchOptions(ef_search=50))
    assert all(h.id != "60" for h in hits)
    assert idx.get_stats().count == 149


def test_cosine_normalized_at_insert_and_query():
    idx, base = built(n=200, metric=Metric.COSINE)
    hits = idx.search(base[40] * 9.0, 1, SearchOptions(ef_search=50))
    assert hits[0].id == "40"
    assert hits[0].score == pytest.approx(1.0, abs=1e-3)


def test_inner_product_metric():
    idx, base = built(n=300, metric=Metric.INNER_PRODUCT)
    q = synthetic(4, 16, seed=8)
    truth = ground_truth(base, q, 5, "IP")
    res = idx.search_batch(q, 5, SearchOptions(ef_search=64))
    ids = np.array([[int(h.id) for h in hits] + [-1] * (5 - len(hits)) for hits in res])
    assert recall_at_k(ids, truth, 5) >= 0.7


def test_empty_index():
    idx = HnswIndex(8)
    assert idx.search(np.ones(8, np.float32), 5) == []


def test_single_node():
    idx = HnswIndex(8)
    idx.add("only", np.ones(8, np.float32))
    hits = idx.search(np.ones(8, np.float32), 5)
    assert [h.id for h in hits] == ["only"]


def test_snapshot_load_roundtrip(tmp_path):
    idx, base = built(n=200)
    idx.delete("9")
    p = str(tmp_path / "hnsw.npz")
    idx.snapshot(p)
    fresh = HnswIndex(16)
    fresh.load(p)
    assert fresh.get_stats().count == 199
    hits = fresh.search(base[100], 3, SearchOptions(ef_search=50))
    assert hits[0].id == "100"
    assert all(h.id != "9" for h in fresh.search(base[9], 20, SearchOptions(ef_search=50)))


def test_batch_matches_single():
    idx, base = built(n=300)
    q = base[:4] + 0.001
    batch = idx.search_batch(q, 5, SearchOptions(ef_search=50))
    for i in range(4):
        single = idx.search(q[i], 5, SearchOptions(ef_search=50))
        assert [h.id for h in batch[i]] == [h.id for h in single]


# ---- device-bootstrapped bulk construction ---------------------------------


def test_bootstrap_build_recall_parity():
    """The device-bootstrapped builder (ops/hnsw_bootstrap.py) must land
    within a few recall points of the incremental builder on the same
    corpus — construction differs (bulk KNN + heuristic vs sequential
    inserts), so parity is measured in recall, not graph bytes."""
    import numpy as np

    from pyrope_tpu.utils.datasets import (
        ground_truth,
        recall_at_k,
        synthetic_clustered,
        synthetic_clustered_queries,
    )

    n, dim = 4000, 16
    base = synthetic_clustered(n, dim, n_clusters=20)
    q = synthetic_clustered_queries(32, dim, n_clusters=20)
    truth = ground_truth(base, q, 10, "L2")
    ids = [str(i) for i in range(n)]
    rec = {}
    for mode in ("incremental", "bootstrap"):
        idx = HnswIndex(dim, "L2", m=16, ef_construction=100, ef_search=50,
                        build_mode=mode)
        idx.add_batch(ids, base)
        res = idx.search_batch(q, 10)
        rows = np.array(
            [[int(h.id) for h in hits] + [-1] * (10 - len(hits)) for hits in res]
        )
        rec[mode] = recall_at_k(rows, truth, 10)
    assert rec["bootstrap"] >= rec["incremental"] - 0.08
    assert rec["bootstrap"] >= 0.85


def test_bootstrap_graph_structure():
    """Bootstrap graphs carry the same invariants the incremental builder
    guarantees: in-range neighbor ids, no self loops, entry at top level,
    upper-layer adjacency only among nodes of that level."""
    import numpy as np

    from pyrope_tpu.utils.datasets import synthetic

    n, dim = 2000, 8
    base = synthetic(n, dim)
    idx = HnswIndex(dim, "L2", m=8, build_mode="bootstrap")
    idx.add_batch([str(i) for i in range(n)], base)
    adj0 = idx._adj0[:n]
    assert adj0.max() < n
    assert not any((adj0[i] == i).any() for i in range(n))
    assert idx._levels[idx._entry] == idx._top_level
    for lev, a in enumerate(idx._adj_up, start=1):
        rows = np.flatnonzero((a[:n] >= 0).any(axis=1))
        assert (idx._levels[rows] >= lev).all()
        nbrs = a[rows]
        assert (idx._levels[nbrs[nbrs >= 0]] >= lev).all()
    # mutation after bulk build falls back to incremental insert
    idx.add("new", np.full(dim, 0.5, np.float32))
    assert idx.search(np.full(dim, 0.5, np.float32), 1)[0].id == "new"
    idx.delete("17")
    assert all(h.id != "17" for h in idx.search(base[17], 10))


def test_bootstrap_requires_heuristic_falls_back():
    """closest-M indexes (neighbor_heuristic=False) must not route to the
    bootstrap path — it IS the heuristic selection rule."""
    import numpy as np

    from pyrope_tpu.utils.datasets import synthetic

    base = synthetic(500, 8)
    idx = HnswIndex(8, "L2", m=8, neighbor_heuristic=False,
                    build_mode="bootstrap")
    idx.add_batch([str(i) for i in range(500)], base)
    assert idx.get_stats().count == 500
    assert idx.search(base[3], 1)[0].id == "3"


def test_fill_tail_slots_no_collision():
    """Regression: when the free slots sit at the row tail, the overflow
    tail-overwrite must not clobber a slot just filled (the old m-1-j
    indexing lost half the highway links on routing-backbone nodes)."""
    import numpy as np

    from pyrope_tpu.ops.hnsw_bootstrap import _fill_tail_slots

    m = 6
    row = np.array([10, 11, 12, 13, -1, -1], np.int32)  # free = tail slots
    _fill_tail_slots(row, [100, 101, 102, 103])
    assert sorted(x for x in row if x >= 100) == [100, 101, 102, 103]
    # the two free slots took two targets; two occupied tail-most
    # NON-claimed slots (3, 2) took the rest
    assert row[4] == 100 and row[5] == 101
    assert row[3] == 102 and row[2] == 103
    assert row[0] == 10 and row[1] == 11  # head links untouched

    # fewer targets than free slots: no overwrites at all
    row2 = np.array([-1, 20, -1, 21], np.int32)
    _fill_tail_slots(row2, [7])
    assert list(row2) == [7, 20, -1, 21]


def test_visited_pool_matches_bitmap_exactly():
    """The in-pool dedup must return the SAME ids in the SAME order as the
    [B, N] visited bitmap on tie-free data (the equivalence argument in
    beam_search_body: an evicted/rejected node's score can never re-beat
    the monotone kth bound, and pool incumbents win exact ties)."""
    import numpy as np

    from pyrope_tpu.types import SearchOptions
    from pyrope_tpu.utils.datasets import (
        synthetic,
        synthetic_clustered,
        synthetic_clustered_queries,
        synthetic_queries,
    )

    for data, qs in (
        (synthetic(5000, 24), synthetic_queries(64, 24)),
        (synthetic_clustered(5000, 24), synthetic_clustered_queries(64, 24)),
    ):
        ids = [str(i) for i in range(len(data))]
        a = HnswIndex(24, "L2", m=8, ef_construction=100, visited_mode="pool")
        b = HnswIndex(24, "L2", m=8, ef_construction=100,
                      visited_mode="bitmap")
        a.add_batch(ids, data)
        b.add_batch(ids, data)
        for ef in (10, 50, 120):
            ra = a.search_batch(qs, 10, SearchOptions(ef_search=ef))
            rb = b.search_batch(qs, 10, SearchOptions(ef_search=ef))
            for i in range(len(qs)):
                assert [h.id for h in ra[i]] == [h.id for h in rb[i]], (ef, i)
                assert np.allclose([h.score for h in ra[i]],
                                   [h.score for h in rb[i]])


def test_bf16_beam_returns_fp32_exact_scores():
    """search_dtype=bfloat16 walks a bf16 slab but the returned scores must
    come from the fp32 rerank of the final pool — bit-exact against host
    fp32 scoring of the same rows (the PQ fp32-refine-slab convention)."""
    idx, base = built(n=400, search_dtype="bfloat16")
    assert idx.search_dtype == "bfloat16"
    q = synthetic(8, 16, seed=9)
    res = idx.search_batch(q, 5, SearchOptions(ef_search=64))
    for qi, hits in enumerate(res):
        for h in hits:
            row = idx._id_to_row[h.id]
            exact = float(idx._scores(q[qi], np.array([row]))[0])
            assert h.score == pytest.approx(exact, rel=1e-6, abs=1e-5), (
                qi, h.id)


def test_bf16_matches_fp32_search():
    """bf16 beam membership equals the fp32 walk on data whose NN margins
    dwarf bf16 rounding (small n, wide ef); scores agree to fp32."""
    base = synthetic(600, 16)
    ids = [str(i) for i in range(len(base))]
    a = HnswIndex(16, "L2", m=8, ef_construction=100, search_dtype="bfloat16")
    b = HnswIndex(16, "L2", m=8, ef_construction=100, search_dtype="float32")
    a.add_batch(ids, base)
    b.add_batch(ids, base)
    q = synthetic(32, 16, seed=3)
    ra = a.search_batch(q, 10, SearchOptions(ef_search=80))
    rb = b.search_batch(q, 10, SearchOptions(ef_search=80))
    same = sum(
        [h.id for h in ra[i]] == [h.id for h in rb[i]] for i in range(len(q))
    )
    assert same >= int(0.9 * len(q)), same
    for i in range(len(q)):
        for ha, hb in zip(ra[i], rb[i]):
            if ha.id == hb.id:
                assert ha.score == pytest.approx(hb.score, rel=1e-5)


def test_search_dtype_validation():
    with pytest.raises(ValueError):
        HnswIndex(16, "L2", search_dtype="fp16")


def test_early_exit_is_a_fixed_point():
    """The while_loop early exit must land on the SAME results as running
    the loops to their full static caps (the cap is beam_schedule's steps;
    here we hand the body double the budget and expect identical ids)."""
    import jax.numpy as jnp

    from pyrope_tpu.index.hnsw import _hnsw_search_fn, beam_schedule
    from pyrope_tpu.ops.scalars import device_i32

    idx, base = built(n=800)
    q = synthetic(16, 16, seed=11)
    pool, steps = beam_schedule(48, 10)
    dev = idx._sync()
    from pyrope_tpu.types import Metric as M
    fn1 = _hnsw_search_fn(M.L2, 10, pool, steps, dev["n_upper"], "pool", True)
    fn2 = _hnsw_search_fn(M.L2, 10, pool, steps * 2, dev["n_upper"], "pool",
                          True)
    args = (dev["x"], dev["x_exact"], dev["sqnorm"], dev["adj0"],
            dev["adj_up"], dev["alive"], device_i32(idx._entry),
            jnp.asarray(q))
    v1, r1 = fn1(*args)
    v2, r2 = fn2(*args)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.allclose(np.asarray(v1), np.asarray(v2))


class TestRelabel:
    """relabel() permutes rows for gather locality; results must be
    INVARIANT (isomorphic graph, _row_ids/_id_to_row move with the rows)."""

    def _built(self, n=1200, dim=16):
        import numpy as np

        from pyrope_tpu import HnswIndex

        rng = np.random.default_rng(3)
        base = rng.random((n, dim), dtype=np.float32)
        idx = HnswIndex(dim, "L2", m=8, ef_construction=64, ef_search=32)
        idx.add_batch([str(i) for i in range(n)], base)
        return idx, base, rng.random((16, dim), dtype=np.float32)

    @pytest.mark.parametrize("order", ["cluster", "bfs", "random"])
    def test_results_invariant(self, order):
        idx, base, q = self._built()
        before = [[(h.id, round(h.score, 5)) for h in r]
                  for r in idx.search_batch(q, 10)]
        idx.relabel(order)
        after = [[(h.id, round(h.score, 5)) for h in r]
                 for r in idx.search_batch(q, 10)]
        assert before == after

    def test_delete_upsert_after_relabel(self):
        idx, base, q = self._built(n=400)
        idx.relabel("cluster")
        assert idx.search(base[7], 1)[0].id == "7"
        assert idx.delete("7")
        assert all(h.id != "7" for h in idx.search(base[7], 10))
        idx.upsert("42", base[42] * 0.0 + 9.0)
        import numpy as np

        nv = np.full(16, 9.0, np.float32)
        assert idx.search(nv, 1)[0].id == "42"
