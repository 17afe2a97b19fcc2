#!/usr/bin/env python
"""E2E load test: SLO compliance matrix over concurrency x cache on/off.

Analog of the reference's scripts/load_test.sh:1-147 — starts the full
server in-process, fans out concurrent RESP clients, and reports QPS +
latency quantiles against an SLO target (env SLO_P99_MS, default 50) for
each (concurrency, cache) cell.

Usage: python scripts/load_test.py [--n 5000] [--dim 32] [--duration 5]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyrope_tpu.cache import CachePolicyConfig  # noqa: E402
from pyrope_tpu.security import AuthSettings  # noqa: E402
from pyrope_tpu.server.app import PyropeApp, enable_compilation_cache  # noqa: E402
from pyrope_tpu.server.engine import EngineConfig  # noqa: E402
from pyrope_tpu.server.resp_client import RespClient  # noqa: E402
from pyrope_tpu.utils.parsing import encode_vector  # noqa: E402
from pyrope_tpu.utils.stats import LatencySummary  # noqa: E402


def start_app() -> tuple[PyropeApp, asyncio.AbstractEventLoop]:
    app = PyropeApp(
        config=EngineConfig(auth=AuthSettings(enabled=False)),
        resp_port=0, http_port=0,
    )
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(app.start())
        started.set()
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    started.wait(30)
    return app, loop


def worker(port: int, queries: np.ndarray, stop_at: float, out: list,
           errors: list, index: str = "idx") -> None:
    lat = []
    n = 0
    rng = np.random.default_rng(threading.get_ident() % 2**32)
    try:
        with RespClient("127.0.0.1", port, timeout=120) as c:
            while time.time() < stop_at:
                q = queries[rng.integers(0, len(queries))]
                t0 = time.perf_counter()
                c.vec_search("lt", index, encode_vector(q), 10)
                lat.append((time.perf_counter() - t0) * 1000)
                n += 1
    except Exception as e:  # noqa: BLE001 — a dead worker must fail the cell
        errors.append(repr(e))
    out.append((n, lat))


def run_cell(app, port, queries, concurrency: int, duration: float,
             index: str = "idx") -> dict:
    stop_at = time.time() + duration
    results: list = []
    errors: list = []
    threads = [
        threading.Thread(target=worker,
                         args=(port, queries, stop_at, results, errors, index))
        for _ in range(concurrency)
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    total = sum(n for n, _ in results)
    lat = [x for _, ls in results for x in ls]
    s = LatencySummary.from_samples(lat)
    return {
        "concurrency": concurrency,
        "qps": round(total / wall, 1),
        "p50_ms": round(s.p50_ms, 2),
        "p99_ms": round(s.p99_ms, 2),
        "requests": total,
        "errors": len(errors),
        "error_sample": errors[:3],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--duration", type=float, default=5.0)
    ap.add_argument("--concurrency", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--pool", type=int, default=32,
                    help="distinct query pool size (small pool => cache-on "
                         "cells exercise the hit path)")
    args = ap.parse_args()
    slo_p99 = float(os.environ.get("SLO_P99_MS", "50"))

    enable_compilation_cache()
    app, loop = start_app()
    port = app.resp.port
    rng = np.random.default_rng(42)
    base = rng.random((args.n, args.dim), dtype=np.float32)
    print(f"loading {args.n} x {args.dim} ...", file=sys.stderr)
    app.engine.add_batch("lt", "idx", [f"v{i}" for i in range(args.n)], base)
    queries = rng.random((args.pool, args.dim), dtype=np.float32)
    # warm the compile
    with RespClient("127.0.0.1", port, timeout=300) as c:
        c.vec_search("lt", "idx", encode_vector(queries[0]), 10)

    rows = []
    for cache_on in (False, True):
        app.engine.policy.store.update(
            CachePolicyConfig(enable_cache=cache_on, default_ttl_seconds=60)
        )
        app.engine.flush_cache()
        for conc in args.concurrency:
            cell = run_cell(app, port, queries, conc, args.duration)
            cell["cache"] = "on" if cache_on else "off"
            cell["slo_p99_ms"] = slo_p99
            # zero successful requests (or any worker error) can never meet an SLO
            cell["slo_met"] = (
                cell["requests"] > 0 and cell["errors"] == 0
                and cell["p99_ms"] <= slo_p99
            )
            rows.append(cell)
            print(json.dumps(cell), file=sys.stderr)

    print(json.dumps({"slo_p99_ms": slo_p99, "cells": rows}, indent=1))
    met = sum(r["slo_met"] for r in rows)
    print(f"SLO met in {met}/{len(rows)} cells", file=sys.stderr)


if __name__ == "__main__":
    main()
