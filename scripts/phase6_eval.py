#!/usr/bin/env python
"""Three E2E feature scenarios.

Analog of the reference's scripts/phase6_eval.py:27-173:

1. delta-index write-heavy: stream adds into the head, compact, compare
   pre/post-compaction query latency (ref delta scenario);
2. semantic-cache repeat-query: same query repeated -> L0/L1/L2 hit path
   speedup (ref cache scenario);
3. prefetch A->B sequence: teach the Markov predictor an A->B pattern and
   verify the predicted cluster's results are pre-warmed (ref prefetch
   scenario).

Runs fully in-process against PyropeEngine (no sockets) and prints one JSON
report.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyrope_tpu.cache import StaticPolicyEngine  # noqa: E402
from pyrope_tpu.security import AuthSettings  # noqa: E402
from pyrope_tpu.server.app import enable_compilation_cache  # noqa: E402
from pyrope_tpu.server.engine import EngineConfig, PyropeEngine  # noqa: E402
from pyrope_tpu.types import IndexConfig, IndexParams  # noqa: E402


def mk_engine() -> PyropeEngine:
    eng = PyropeEngine(EngineConfig(auth=AuthSettings(enabled=False)))
    eng.policy = StaticPolicyEngine(ttl_seconds=300)
    return eng


def timed_search(eng, tenant, index, q, reps=20) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = eng.search(tenant, index, q, 10)
        assert r.ok, r.error_message
        ts.append((time.perf_counter() - t0) * 1000)
    return sorted(ts)[len(ts) // 2]


def scenario_delta(n=5000, dim=32) -> dict:
    """Write-heavy Delta: query the unbuilt head vs the compacted tail."""
    eng = mk_engine()
    rng = np.random.default_rng(42)
    base = rng.random((n, dim), dtype=np.float32)
    eng.create_index("p6", "delta", IndexConfig(dim=dim, algorithm="IVF_FLAT",
                                                params=IndexParams(nlist=100)))
    eng.add_batch("p6", "delta", [f"v{i}" for i in range(n)], base)
    q = base[17] + 1e-4
    pre_ms = timed_search(eng, "p6", "delta", q)
    t0 = time.perf_counter()
    eng.build_index("p6", "delta")
    build_s = time.perf_counter() - t0
    post_ms = timed_search(eng, "p6", "delta", q)
    return {
        "scenario": "delta_compaction",
        "pre_build_p50_ms": round(pre_ms, 2),
        "post_build_p50_ms": round(post_ms, 2),
        "build_s": round(build_s, 2),
    }


def scenario_semantic_cache(n=5000, dim=32) -> dict:
    """Repeat query: miss -> engine; repeats -> cache hit path."""
    eng = mk_engine()
    rng = np.random.default_rng(43)
    base = rng.random((n, dim), dtype=np.float32)
    eng.create_index("p6", "cache", IndexConfig(dim=dim, algorithm="FLAT"))
    eng.add_batch("p6", "cache", [f"v{i}" for i in range(n)], base)
    # warm the compile with a DIFFERENT query so q's cache line stays cold
    eng.search("p6", "cache", base[7] + 2e-4, 10)
    q = base[99] + 1e-4
    t0 = time.perf_counter()
    eng.search("p6", "cache", q, 10, trace=True)
    cold_ms = (time.perf_counter() - t0) * 1000
    hits = []
    for _ in range(50):
        t0 = time.perf_counter()
        r = eng.search("p6", "cache", q, 10, trace=True)
        hits.append((time.perf_counter() - t0) * 1000)
        assert r.trace.cache_hit
    hit_ms = sorted(hits)[len(hits) // 2]
    return {
        "scenario": "semantic_cache_repeat",
        "cold_ms": round(cold_ms, 2),
        "hit_p50_ms": round(hit_ms, 3),
        "speedup": round(cold_ms / max(hit_ms, 1e-6), 1),
    }


def scenario_prefetch(dim=16) -> dict:
    """A->B cluster sequence: predicted next cluster is served pre-warmed."""
    eng = mk_engine()
    rng = np.random.default_rng(44)
    a = rng.normal(0, 0.01, (40, dim)).astype(np.float32)
    b = (rng.normal(0, 0.01, (40, dim)) + 5).astype(np.float32)
    eng.create_index("p6", "pf", IndexConfig(dim=dim, algorithm="IVF_FLAT",
                                             params=IndexParams(nlist=2)))
    eng.add_batch("p6", "pf", [f"v{i}" for i in range(80)], np.concatenate([a, b]))
    eng.build_index("p6", "pf")
    ca = eng.clusters.find_nearest_cluster("p6", "pf", a[0])[0]
    cb = eng.clusters.find_nearest_cluster("p6", "pf", b[0])[0]
    eng.prefetcher.set_rules_for_test({("p6", "pf", ca): cb})
    # touching cluster A triggers a background prefetch of B's centroid
    eng.search("p6", "pf", a[0], 10)
    eng.prefetch_queue.run_pending()
    cents = eng.clusters.get_centroids("p6", "pf")
    t0 = time.perf_counter()
    r = eng.search("p6", "pf", np.asarray(cents[cb]), 10, trace=True)
    warm_ms = (time.perf_counter() - t0) * 1000
    return {
        "scenario": "prefetch_a_to_b",
        "prefetch_hit": bool(r.trace.cache_hit),
        "hit_level": r.trace.cache_level,
        "warm_ms": round(warm_ms, 3),
    }


def main() -> None:
    enable_compilation_cache()
    report = [scenario_delta(), scenario_semantic_cache(), scenario_prefetch()]
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
