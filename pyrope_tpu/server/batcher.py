"""Micro-batching query scheduler.

New TPU-first runtime component with no reference analog: the reference
serves each RESP query with its own CPU scan (concurrency = thread pool,
ref: Extensions/VectorCommandSet.cs one command per connection), which on a
TPU would waste the MXU — a [1, N] matmul uses one row of a 128-wide
systolic array and every dispatch pays the host→device link once.

The batcher turns concurrent single-query requests into one [B, N] device
batch: the first arrival for a (index, top_k, options) key becomes the
**leader**, waits up to ``max_wait_ms`` for followers (or until
``max_batch`` fills, which notifies the leader immediately), then executes
one ``index.search_batch`` for the group and distributes the per-query
results. Callers with an already-batched [B, D] workload should call
``index.search_batch`` directly — ``search`` takes exactly one query.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Optional

import numpy as np

from pyrope_tpu.types import DEFAULT_SEARCH_OPTIONS, SearchOptions, SearchResult


@dataclasses.dataclass
class BatcherStats:
    batches: int = 0
    queries: int = 0
    max_batch_seen: int = 0

    @property
    def avg_batch(self) -> float:
        return self.queries / self.batches if self.batches else 0.0


class BatchError(RuntimeError):
    """Wraps a batch-execution failure for each rider (re-raising one shared
    exception instance from many threads races on its __traceback__)."""


class _Group:
    __slots__ = ("queries", "results", "error", "done", "closed", "full")

    def __init__(self):
        self.queries: list[np.ndarray] = []
        self.results: Optional[list[list[SearchResult]]] = None
        self.error: Optional[BaseException] = None
        self.done = threading.Event()
        self.closed = False
        self.full = threading.Event()  # set when max_batch fills


class MicroBatcher:
    def __init__(self, max_batch: int = 64, max_wait_ms: float = 0.5,
                 max_inflight: int = 2, linger_ms: float = 0.0):
        """``max_inflight`` bounds concurrent device batches (0 = no gate).
        The gate is what makes coalescing track device pressure: a leader
        acquires a slot BEFORE closing its group, so while the device is
        busy with earlier batches, the open group keeps absorbing arrivals
        instead of spawning contending single-query dispatches. With a
        ~30 ms-per-round-trip link (or any saturated chip) this is the
        difference between avg_batch ~1 and avg_batch ~max_batch at high
        concurrency; 2 keeps the dispatch pipeline non-empty while the
        previous batch executes.

        ``linger_ms`` is a post-acquire hold: after winning a device slot
        the leader waits up to this long (early-exit when ``max_batch``
        fills) before closing. Closed-loop serving ping-pongs otherwise —
        the cohort whose batch just completed re-sends while the next group
        dispatches without it, so avg_batch locks at ~half the offered
        concurrency (measured: 32 of 64). The linger gives the finishing
        cohort one response-turnaround to merge in. Use on high-RTT links
        (tunnel ~30 ms); keep 0 when co-located — it taxes every batch.
        The hold only runs when a slot was actually acquired: after the
        gate-timeout escape hatch (wedged device) or with no gate at all
        there is no device-pressure signal, and lingering would only delay
        the emergency dispatch / tax every batch."""
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.linger_s = linger_ms / 1000.0
        self._lock = threading.Lock()
        self._groups: dict[tuple, _Group] = {}
        self._gate = (
            threading.BoundedSemaphore(max_inflight) if max_inflight else None
        )
        # a wedged device batch must not stall the whole serving plane: a
        # leader that cannot get a slot within this window dispatches
        # ungated (pre-gate behavior — only the wedged batch's riders hang)
        self.gate_timeout_s = 5.0
        self.stats = BatcherStats()

    @staticmethod
    def _key(index, top_k: int, options: SearchOptions) -> tuple:
        return (id(index), top_k, options)

    def search(
        self,
        index,
        query: np.ndarray,
        top_k: int,
        options: SearchOptions = DEFAULT_SEARCH_OPTIONS,
    ) -> list[SearchResult]:
        """One logical query; may ride a shared device batch."""
        q = np.asarray(query, np.float32)
        if q.ndim != 1:
            raise ValueError(
                f"search() takes one query vector, got shape {q.shape}; "
                "use index.search_batch for pre-batched workloads"
            )
        key = self._key(index, top_k, options)
        with self._lock:
            group = self._groups.get(key)
            if group is None or group.closed:
                group = _Group()
                self._groups[key] = group
                leader = True
            else:
                leader = False
            slot = len(group.queries)
            group.queries.append(q)
            if slot + 1 >= self.max_batch:
                group.closed = True
                self._groups.pop(key, None)
                group.full.set()  # wake the leader immediately

        if leader:
            if not group.closed:
                # wait for followers; a full group wakes us without polling
                group.full.wait(self.max_wait_s)
            # acquire a device slot BEFORE closing: while earlier batches
            # hold the gate, this group stays open and keeps absorbing
            # arrivals (it may fill and close via the max_batch path, which
            # is fine — the queries list only ever grows until closed).
            # Bounded wait: on timeout (slots wedged) dispatch ungated.
            holds_slot = (
                self._gate.acquire(timeout=self.gate_timeout_s)
                if self._gate is not None else False
            )
            if self.linger_s and holds_slot and not group.closed:
                # POST-ACQUIRE hold: let the cohort that just got its
                # responses re-send and join (early-exit when full).
                # Gated on holds_slot: after the gate-timeout escape hatch
                # (wedged device) or in ungated configs there was no
                # acquire, and lingering would only delay the emergency
                # dispatch / tax every batch
                group.full.wait(self.linger_s)
            try:
                with self._lock:
                    if not group.closed:
                        group.closed = True
                        if self._groups.get(key) is group:
                            self._groups.pop(key)
                batch = np.stack(group.queries)
                group.results = index.search_batch(batch, top_k, options)
                with self._lock:
                    self.stats.batches += 1
                    self.stats.queries += len(batch)
                    self.stats.max_batch_seen = max(
                        self.stats.max_batch_seen, len(batch)
                    )
            except BaseException as e:  # propagate to every rider
                group.error = e
            finally:
                if holds_slot:
                    self._gate.release()
                group.done.set()
        else:
            group.done.wait()

        if group.error is not None:
            raise BatchError(str(group.error)) from group.error
        return group.results[slot]

    def to_dict(self) -> dict:
        with self._lock:
            return {
                "batches": self.stats.batches,
                "queries": self.stats.queries,
                "avg_batch": round(self.stats.avg_batch, 2),
                "max_batch_seen": self.stats.max_batch_seen,
            }
