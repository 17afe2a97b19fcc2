#!/usr/bin/env python
"""Concurrency soak: sustained mixed read/write load against the full stack.

The reference gets its thread-safety from locks audited by review (SURVEY
§5.2: no TSAN); this is the rebuild's empirical check — N client threads
hammer one in-process engine+RESP server with interleaved adds, upserts,
deletes, searches, builds, and stats for a fixed duration, with invariant
assertions at the end.

Usage: python scripts/soak_test.py [--seconds 30] [--clients 8] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from pyrope_tpu.server.app import enable_compilation_cache

    enable_compilation_cache()

    from pyrope_tpu.cache import StaticPolicyEngine
    from pyrope_tpu.security import AuthSettings
    from pyrope_tpu.server.engine import EngineConfig, PyropeEngine
    from pyrope_tpu.types import IndexConfig, IndexParams

    eng = PyropeEngine(EngineConfig(auth=AuthSettings(enabled=False)))
    eng.policy = StaticPolicyEngine(ttl_seconds=5)
    rng = np.random.default_rng(42)
    base = rng.random((args.n, args.dim), dtype=np.float32)
    eng.create_index("soak", "idx", IndexConfig(dim=args.dim, algorithm="IVF_FLAT",
                                                params=IndexParams(nlist=16)))
    eng.add_batch("soak", "idx", [f"v{i}" for i in range(args.n)], base)
    eng.build_index("soak", "idx")

    stop_at = time.time() + args.seconds
    errors: list = []
    counters = {"search": 0, "write": 0, "delete": 0, "build": 0, "stats": 0}
    clock = threading.Lock()

    def bump(k):
        with clock:
            counters[k] += 1

    def worker(wid: int):
        wrng = np.random.default_rng(wid)
        try:
            while time.time() < stop_at:
                op = wrng.random()
                i = int(wrng.integers(0, args.n))
                if op < 0.70:
                    r = eng.search("soak", "idx", base[i] + 1e-4, 10)
                    assert r.ok, r.error_message
                    bump("search")
                elif op < 0.85:
                    v = wrng.random(args.dim).astype(np.float32)
                    r = eng.add("soak", "idx", f"w{wid}-{int(wrng.integers(0, 50))}",
                                v, upsert=True)
                    assert r.ok, r.error_message
                    bump("write")
                elif op < 0.95:
                    eng.delete("soak", "idx", f"w{wid}-{int(wrng.integers(0, 50))}")
                    bump("delete")
                else:
                    s = eng.stats("soak", "idx")
                    assert s is not None and s["count"] >= args.n  # base rows never deleted
                    bump("stats")
        except Exception as e:  # noqa: BLE001
            errors.append((wid, repr(e)))

    def builder():
        try:
            while time.time() < stop_at:
                time.sleep(3.0)
                eng.build_index("soak", "idx")
                bump("build")
        except Exception as e:  # noqa: BLE001
            errors.append(("builder", repr(e)))

    def background():
        try:
            while time.time() < stop_at:
                time.sleep(0.5)
                eng.tick_background()
        except Exception as e:  # noqa: BLE001
            errors.append(("background", repr(e)))

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(args.clients)]
    threads += [threading.Thread(target=builder), threading.Thread(target=background)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=args.seconds + 120)
        if t.is_alive():
            errors.append((t.name, "DEADLOCK: thread still alive after join timeout"))
    wall = time.time() - t0

    print(f"ops: {counters} in {wall:.1f}s "
          f"({sum(counters.values())/wall:,.0f} ops/s)", file=sys.stderr)
    if errors:
        for wid, e in errors[:10]:
            print(f"ERROR worker {wid}: {e}", file=sys.stderr)
        sys.exit(1)
    # final invariants: a known row is still findable; stats are sane
    r = eng.search("soak", "idx", base[1] + 1e-4, 5)
    assert r.ok and len(r.hits) > 0
    s = eng.stats("soak", "idx")
    assert s["count"] >= args.n
    print(f"SOAK OK: {sum(counters.values())} ops, 0 errors")


if __name__ == "__main__":
    main()
