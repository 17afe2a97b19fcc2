"""Model-based testing: random op sequences vs a brute-force oracle.

Every index family must agree with a trivial dict-of-vectors oracle on the
*semantics* of add/upsert/delete/build (exact families agree on results
too; ANN families must at least respect liveness). This catches the drift
class of bug the reviews kept finding (duplicate-add mutation, overlap
miscounts, tombstone revivals) for arbitrary interleavings, not just the
hand-written cases.
"""

import numpy as np
import pytest

import pyrope_tpu as pt
from pyrope_tpu.types import SearchOptions


class Oracle:
    """Reference semantics: a dict of live vectors."""

    def __init__(self, dim):
        self.dim = dim
        self.live: dict[str, np.ndarray] = {}

    def add(self, id, v):
        if id in self.live:
            return False
        self.live[id] = v
        return True

    def upsert(self, id, v):
        self.live[id] = v

    def delete(self, id):
        return self.live.pop(id, None) is not None

    def count(self):
        return len(self.live)

    def exact_topk(self, q, k):
        if not self.live:
            return []
        ids = list(self.live)
        mat = np.stack([self.live[i] for i in ids])
        d2 = ((q - mat) ** 2).sum(axis=1)
        order = np.argsort(d2, kind="stable")[:k]
        return [(ids[i], -float(d2[i])) for i in order]


def random_ops(rng, n_ops, dim, id_pool=40):
    for _ in range(n_ops):
        op = rng.random()
        id = f"k{rng.integers(0, id_pool)}"
        v = rng.random(dim, dtype=np.float32)
        if op < 0.45:
            yield ("add", id, v)
        elif op < 0.65:
            yield ("upsert", id, v)
        elif op < 0.85:
            yield ("delete", id, None)
        else:
            yield ("build", None, None)


def apply_ops(idx, oracle, ops):
    for op, id, v in ops:
        if op == "add":
            got = idx.add(id, v)
            want = oracle.add(id, v)
            assert got == want, f"add({id}) returned {got}, oracle says {want}"
        elif op == "upsert":
            idx.upsert(id, v)
            oracle.upsert(id, v)
        elif op == "delete":
            got = idx.delete(id)
            want = oracle.delete(id)
            assert got == want, f"delete({id}) returned {got}, oracle says {want}"
        else:
            idx.build()


FAMILIES = {
    "flat": lambda d: pt.FlatIndex(d, "L2"),
    "ivf": lambda d: pt.IvfFlatIndex(d, "L2", nlist=4),
    "delta": lambda d: pt.DeltaIndex(pt.FlatIndex(d, "L2"),
                                     pt.IvfFlatIndex(d, "L2", nlist=4)),
    "ivfpq": lambda d: pt.IvfPqIndex(d, "L2", nlist=4, pq_m=4, ksub=16),
    "hnsw": lambda d: pt.HnswIndex(d, "L2", m=4, ef_construction=32, ef_search=32),
}

EXACT = {"flat", "ivf", "delta"}  # exact distances: results must match oracle


@pytest.mark.parametrize("family", sorted(FAMILIES))
@pytest.mark.parametrize("seed", [0, 1])
def test_random_ops_vs_oracle(family, seed):
    rng = np.random.default_rng(seed)
    dim = 8
    idx = FAMILIES[family](dim)
    oracle = Oracle(dim)
    apply_ops(idx, oracle, random_ops(rng, 120, dim))

    # count parity
    assert idx.get_stats().count == oracle.count()

    # scan() liveness parity (HNSW keeps tombstoned routing nodes but must
    # not SCAN them)
    scanned = {i for i, _ in idx.scan()}
    assert scanned == set(oracle.live), (
        f"scan mismatch: extra={scanned - set(oracle.live)}, "
        f"missing={set(oracle.live) - scanned}"
    )

    # search results: no dead ids ever; exact families match the oracle
    # (probe everything so IVF is exhaustive)
    opts = SearchOptions(nprobe=10_000, ef_search=256)
    for _ in range(5):
        q = rng.random(dim, dtype=np.float32)
        hits = idx.search(q, 5, opts)
        ids = [h.id for h in hits]
        assert len(ids) == len(set(ids)), f"duplicate hits: {ids}"
        assert all(i in oracle.live for i in ids), (
            f"dead id served: {set(ids) - set(oracle.live)}"
        )
        if family in EXACT:
            want = [i for i, _ in oracle.exact_topk(q, 5)]
            assert set(ids) == set(want), f"{ids} != {want}"


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_snapshot_load_preserves_semantics(family, tmp_path):
    rng = np.random.default_rng(7)
    dim = 8
    idx = FAMILIES[family](dim)
    oracle = Oracle(dim)
    apply_ops(idx, oracle, random_ops(rng, 80, dim))
    idx.build()
    p = str(tmp_path / f"{family}.snap")
    idx.snapshot(p)
    fresh = FAMILIES[family](dim)
    import os

    load_path = p if os.path.exists(p) else p + ".npz"
    fresh.load(load_path)
    assert fresh.get_stats().count == oracle.count()
    scanned = {i for i, _ in fresh.scan()}
    assert scanned == set(oracle.live)
