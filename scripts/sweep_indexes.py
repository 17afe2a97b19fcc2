#!/usr/bin/env python
"""IVF nlist/nprobe sweep + HNSW ef sweep with recall@10 + QPS.

Analog of the reference's scripts/verify_p10.sh (nlist sweep + HNSW
comparison), upgraded with the recall measurement the reference never had
(SURVEY §4: no recall@k anywhere in the reference).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(idx, queries, topk, base, truth, options=None):
    import jax.numpy as jnp

    import pyrope_tpu as pt
    from pyrope_tpu.utils.datasets import recall_at_k

    opts = options or pt.SearchOptions()
    q_dev = jnp.asarray(queries)
    v, r = idx.device_search(q_dev, topk, opts)
    np.asarray(v)  # completion fence
    iters = 50
    t0 = time.perf_counter()
    outs = [idx.device_search(q_dev, topk, opts) for _ in range(iters)]
    np.asarray(outs[-1][0])
    qps = iters * len(queries) / (time.perf_counter() - t0)
    rows = idx.resolve_rows(np.asarray(r))
    from pyrope_tpu.utils.datasets import id_lists_to_rows

    return round(qps, 1), round(recall_at_k(id_lists_to_rows(rows), truth, topk), 4)


def main() -> None:
    import pyrope_tpu as pt
    from pyrope_tpu.server.app import enable_compilation_cache
    from pyrope_tpu.utils.datasets import ground_truth, synthetic, synthetic_queries

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--topk", type=int, default=10)
    args = ap.parse_args()

    enable_compilation_cache()
    base = synthetic(args.n, args.dim)
    queries = synthetic_queries(args.batch, args.dim)
    truth = ground_truth(base, queries, args.topk, "L2")
    ids = [str(i) for i in range(args.n)]
    rows = []

    for nlist in (50, 100, 200):
        idx = pt.IvfFlatIndex(args.dim, "L2", nlist=nlist)
        idx.add_batch(ids, base)
        t0 = time.perf_counter()
        idx.build()
        build_s = time.perf_counter() - t0
        for nprobe in (3, 8, 16):
            qps, rec = measure(idx, queries, args.topk, base, truth,
                               pt.SearchOptions(nprobe=nprobe))
            rows.append({"index": "IVF_FLAT", "nlist": nlist, "nprobe": nprobe,
                         "build_s": round(build_s, 1), "qps": qps, "recall": rec})
            print(json.dumps(rows[-1]), file=sys.stderr)

    idx = pt.HnswIndex(args.dim, "L2", m=16, ef_construction=200)
    t0 = time.perf_counter()
    idx.add_batch(ids, base)
    build_s = time.perf_counter() - t0
    for ef in (10, 50, 100):
        qps, rec = measure(idx, queries, args.topk, base, truth,
                           pt.SearchOptions(ef_search=ef))
        rows.append({"index": "HNSW", "m": 16, "ef_search": ef,
                     "build_s": round(build_s, 1), "qps": qps, "recall": rec})
        print(json.dumps(rows[-1]), file=sys.stderr)

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
