"""Exact brute-force (Flat) index.

TPU-native rebuild of the reference's ``BruteForceVectorIndex``
(ref: src/Pyrope.GarnetServer/Vector/BruteForceVectorIndex.cs): the per-row
SIMD scan with a min-heap (:275-379) becomes one [B, N] MXU score matmul with
fused masking and ``lax.top_k``. Matches reference semantics:

- score convention L2 -> -d², IP -> dot, cosine -> normalized dot (:350-356)
- ``max_scans`` caps scanned rows in insertion order (:288)
- logical delete via tombstones (:224-248)
- optional SQ8 per-vector min/max quantized storage (:25-40, 297-336) — but
  unlike the reference (which compares raw bytes and loses the per-vector
  scale, see docs/benchmarks/20260118_p10_14_scalar_quantization.md:38-42 in
  the reference), the TPU path applies the exact affine decomposition
  dot(q, x̂) = min·Σq + scale·dot(q, code), so SQ8 recall does not collapse.

Host numpy arrays are the record of truth; a padded device slab (bucketed
capacity, recompile-free growth) is synced lazily before queries.
"""

from __future__ import annotations

import functools
import json
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

from pyrope_tpu.ops.scalars import device_i32
import numpy as np

from pyrope_tpu.index.base import VectorIndex
from pyrope_tpu.ops.distance import score_matrix
from pyrope_tpu.ops.topk import masked_topk
from pyrope_tpu.ops.transfer import upload_rows
from pyrope_tpu.types import (
    DEFAULT_SEARCH_OPTIONS,
    IndexStats,
    Metric,
    SearchOptions,
    SearchResult,
)
from pyrope_tpu.utils.shapes import batch_bucket, capacity_bucket

_STORAGE_DTYPES = {"fp32": jnp.float32, "bf16": jnp.bfloat16}

# Above this batch the hybrid exact path routes to the fp32 Pallas scan:
# the R-wide bitonic merge across many batch groups costs more than the
# fp32 slab's extra bandwidth/MXU passes (same-day A/B at 262k x 128, k=10:
# b64 hybrid 29.8k vs fp32 17.2k QPS; b1024 hybrid 52k vs fp32 109k).
# Both sides of the route are exact, so only the kernel changes.
HYBRID_MAX_BATCH = 256


@functools.lru_cache(maxsize=None)
def _dense_search_fn(metric: Metric, k: int, compute: str | None, selection: str = "exact"):
    """Jitted masked score+top-k over a dense slab. Cache key excludes shapes
    (jit re-specializes per shape); this cache just avoids re-tracing setup."""

    cdtype = None if compute is None else jnp.dtype(compute)

    @jax.jit
    def fn(vecs, sqnorm, alive, q, max_scans):
        scores = score_matrix(q, vecs, metric, x_sqnorm=sqnorm, compute_dtype=cdtype)
        row = jax.lax.broadcasted_iota(jnp.int32, (vecs.shape[0], 1), 0)[:, 0]
        mask = alive & (row < max_scans)
        return masked_topk(scores, mask[None, :], k, selection)

    return fn


def sq8_scores(codes, mins, scales, sqnorm, q, metric: Metric, cdtype) -> jax.Array:
    """[B, cap] metric scores over an SQ8 slab via the exact affine
    decomposition dot(q, x̂) = scale·dot(q, code) + min·Σq (unlike the
    reference, which compares raw bytes and loses the per-vector scale —
    ref: ScalarQuantizer.cs caveat, docs/benchmarks/20260118_p10_14).
    Shared by the single-chip jit and the sharded shard_map local."""
    qf = q.astype(jnp.float32)
    raw = jnp.dot(
        qf.astype(cdtype), codes.astype(cdtype).T,
        preferred_element_type=jnp.float32,
    )  # [B, cap] = dot(q, code)
    qsum = jnp.sum(qf, axis=-1)  # Σq per query
    dots = raw * scales[None, :] + qsum[:, None] * mins[None, :]
    if metric == Metric.INNER_PRODUCT:
        return dots
    if metric == Metric.L2:
        qq = jnp.sum(qf * qf, axis=-1)
        d2 = qq[:, None] - 2.0 * dots + sqnorm[None, :]
        return -jnp.maximum(d2, 0.0)
    qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1))  # COSINE
    xn = jnp.sqrt(jnp.maximum(sqnorm, 1e-24))
    return dots / jnp.maximum(qn[:, None] * xn[None, :], 1e-12)


@functools.lru_cache(maxsize=None)
def _sq8_search_fn(metric: Metric, k: int, compute: str | None, selection: str = "exact"):
    """Jitted SQ8 scan: int8 codes + per-vector (min, scale) affine
    reconstruction folded into the matmul epilogue."""

    cdtype = jnp.bfloat16 if compute is None else jnp.dtype(compute)

    @jax.jit
    def fn(codes, mins, scales, sqnorm, alive, q, max_scans):
        scores = sq8_scores(codes, mins, scales, sqnorm, q, metric, cdtype)
        row = jax.lax.broadcasted_iota(jnp.int32, (codes.shape[0], 1), 0)[:, 0]
        mask = alive & (row < max_scans)
        return masked_topk(scores, mask[None, :], k, selection)

    return fn


@functools.lru_cache(maxsize=None)
def _hybrid_search_fn(metric: Metric, k: int, r: int, row_tile: int,
                      batch_tile: int):
    """bf16-scan + fp32-HIGHEST rerank: exact WITH HIGH PROBABILITY, not
    by construction.

    One jitted dispatch: the fused Pallas kernel scans the bf16 slab and
    keeps each query's top-R shortlist (R >> k, so the handful of true
    top-k rows that bf16 rounding reorders past rank k still land inside
    it), then rerank_exact gathers those R rows from the fp32 slab and
    rescores with Precision.HIGHEST (same pattern as PQ refine / the HNSW
    beam rerank). Exactness requires every true top-k row to survive the
    bf16-SCORED shortlist: with more than R−k rows whose fp32 scores sit
    within bf16 rounding (~0.4% relative) of the kth score, a true
    neighbor can rank past R in bf16 order and the fp32 rerank cannot
    recover it. Default R = max(64, next_pow2(4k)) makes that regime
    adversarial in practice (measured recall 1.0 on every bench config,
    incl. clustered), but a corpus with thousands of near-duplicates of
    the query could breach it — widen with 'hybrid:R' or use
    selection='exact'/'auto' (full fp32) when ties that dense matter."""
    from pyrope_tpu.ops.distance import rerank_exact
    from pyrope_tpu.ops.pallas_scan import pallas_flat_topk

    @jax.jit
    def fn(vecs32, vecs16, sqnorm, alive, q, ms):
        _, rows = pallas_flat_topk(
            q, vecs16, sqnorm, alive, ms, r, metric,
            row_tile=row_tile, batch_tile=batch_tile,
        )
        return rerank_exact(vecs32, sqnorm, q, rows, k, metric)

    return fn


def hybrid_shortlist(k: int, r_param: float, row_tile: int) -> int:
    """Shortlist width R for the hybrid exact path: the explicit
    'hybrid:R' value, else max(64, next_pow2(4k)); power of two (the wide-k
    bitonic merge's scratch width), clamped to the row tile."""
    from pyrope_tpu.utils.shapes import next_pow2

    r = int(r_param) if r_param else max(64, next_pow2(4 * k))
    return min(next_pow2(max(r, k)), row_tile)


@jax.jit
def _scatter3(vecs, sqnorm, alive, idx, v_new, sq_new, alive_new):
    """One fused dispatch for the dense incremental slab update (separate
    .at[].set calls each pay a host->device round trip on tunneled TPUs)."""
    return (
        vecs.at[idx].set(v_new.astype(vecs.dtype)),
        sqnorm.at[idx].set(sq_new),
        alive.at[idx].set(alive_new),
    )


@jax.jit
def _scatter4(vecs, vecs16, sqnorm, alive, idx, v_new, sq_new, alive_new):
    """Fused incremental update of the hybrid path's twin slabs (fp32
    rerank + bf16 scan)."""
    return (
        vecs.at[idx].set(v_new),
        vecs16.at[idx].set(v_new.astype(jnp.bfloat16)),
        sqnorm.at[idx].set(sq_new),
        alive.at[idx].set(alive_new),
    )


@jax.jit
def _scatter5(codes, mins, scales, sqnorm, alive, idx,
              c_new, m_new, s_new, sq_new, alive_new):
    """Fused SQ8 incremental slab update."""
    return (
        codes.at[idx].set(c_new),
        mins.at[idx].set(m_new),
        scales.at[idx].set(s_new),
        sqnorm.at[idx].set(sq_new),
        alive.at[idx].set(alive_new),
    )


def sq8_quantize(vectors: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-vector min/max SQ8 (ref: Vector/ScalarQuantizer.cs:22-62).
    Returns (codes uint8 [N, D], mins [N], scales [N])."""
    v = np.asarray(vectors, dtype=np.float32)
    mins = v.min(axis=1)
    maxs = v.max(axis=1)
    scales = (maxs - mins) / 255.0
    safe = np.where(scales > 0, scales, 1.0)
    codes = np.clip(np.rint((v - mins[:, None]) / safe[:, None]), 0, 255)
    return codes.astype(np.uint8), mins, np.where(scales > 0, scales, 0.0)


class FlatIndex(VectorIndex):
    """Exact scan index with tombstone deletes and optional SQ8 storage."""

    @property
    def _hybrid(self) -> bool:
        """Hybrid exact mode is active (bf16 scan slab + fp32 rerank).
        COSINE falls through to the XLA exact path like 'pallas' does
        (the fused kernel takes pre-normalized IP only)."""
        return (
            self.selection.partition(":")[0] == "hybrid"
            and self.metric != Metric.COSINE
        )

    @property
    def host_write_cheap(self) -> bool:  # see IVectorIndex
        # a single add is microseconds ONLY while it fits the current
        # capacity bucket: crossing one reallocs+copies the whole host slab
        # (O(n), ~512 MB at 1M x 128), which must not run inline on the
        # serving event loop — send the growth write to the thread pool
        return self._count < self._cap

    def __init__(
        self,
        dim: int,
        metric: Metric | str = Metric.L2,
        *,
        storage: str = "fp32",  # fp32 | bf16 | sq8
        compute_dtype: Optional[str] = None,
        # exact | pallas | approx[:recall] (lax.approx_max_k) |
        # hybrid[:R] (bf16 Pallas scan top-R + fp32-HIGHEST rerank — exact)
        selection: str = "exact",
        min_capacity: int = 1024,
    ):
        if storage not in ("fp32", "bf16", "sq8"):
            raise ValueError(f"storage must be fp32|bf16|sq8, got {storage}")
        from pyrope_tpu.ops.topk import parse_selection

        mode, _ = parse_selection(selection)  # validate eagerly
        if mode == "hybrid" and storage != "fp32":
            raise ValueError(
                "selection='hybrid' reranks off the fp32 slab; storage must "
                f"be fp32 (got {storage!r})"
            )
        self.dim = int(dim)
        self.metric = Metric.parse(metric)
        self.storage = storage
        self.compute_dtype = compute_dtype
        self.selection = selection
        self._min_cap = min_capacity
        self._clear()

    def _clear(self) -> None:
        """Reset to empty host state (also used by load(); safe for
        subclasses — it never touches constructor-only config like a mesh)."""
        self._cap = capacity_bucket(0, self._min_cap)
        self._vecs = np.zeros((self._cap, self.dim), np.float32)
        self._alive = np.zeros(self._cap, bool)
        self._row_ids: list[Optional[str]] = [None] * self._cap
        self._id_to_row: dict[str, int] = {}
        self._count = 0        # rows ever used (scan frontier)
        self._live = 0         # live rows
        self._dirty = True
        self._dirty_rows: set[int] = set()
        self._dev: Optional[dict] = None

    # ---- mutation -------------------------------------------------------

    def _ensure_capacity(self, need: int) -> None:
        if need <= self._cap:
            return
        new_cap = capacity_bucket(need, self._min_cap)
        vecs = np.zeros((new_cap, self.dim), np.float32)
        vecs[: self._cap] = self._vecs
        alive = np.zeros(new_cap, bool)
        alive[: self._cap] = self._alive
        self._vecs, self._alive = vecs, alive
        self._row_ids.extend([None] * (new_cap - self._cap))
        self._cap = new_cap
        self._dev = None  # shape changed; drop device slab
        self._mark_all_dirty()

    def _check_vec(self, vector: np.ndarray) -> np.ndarray:
        v = np.asarray(vector, dtype=np.float32).reshape(-1)
        if v.shape[0] != self.dim:
            raise ValueError(f"dim mismatch: expected {self.dim}, got {v.shape[0]}")
        return v

    def _mark_dirty(self, row: int) -> None:
        self._dirty = True
        if self._dirty_rows is not None:
            self._dirty_rows.add(row)
            if len(self._dirty_rows) > 4096:  # too many: full re-upload wins
                self._dirty_rows = None

    def _mark_all_dirty(self) -> None:
        self._dirty = True
        self._dirty_rows = None

    def add(self, id: str, vector: np.ndarray) -> bool:
        v = self._check_vec(vector)
        with self.lock:
            row = self._id_to_row.get(id)
            if row is not None and self._alive[row]:
                return False
            if row is not None:  # revive tombstoned id in place
                self._vecs[row] = v
                self._alive[row] = True
                self._live += 1
            else:
                self._ensure_capacity(self._count + 1)
                row = self._count
                self._vecs[row] = v
                self._alive[row] = True
                self._row_ids[row] = id
                self._id_to_row[id] = row
                self._count += 1
                self._live += 1
            self._mark_dirty(row)
            return True

    def upsert(self, id: str, vector: np.ndarray) -> None:
        v = self._check_vec(vector)
        with self.lock:
            row = self._id_to_row.get(id)
            if row is None:
                self.add(id, v)
                return
            if not self._alive[row]:
                self._live += 1
            self._vecs[row] = v
            self._alive[row] = True
            self._mark_dirty(row)

    def delete(self, id: str) -> bool:
        with self.lock:
            row = self._id_to_row.get(id)
            if row is None or not self._alive[row]:
                return False
            self._alive[row] = False
            self._vecs[row] = 0.0  # GC null-out (ref: BruteForceVectorIndex.cs:224-248)
            self._live -= 1
            self._mark_dirty(row)
            return True

    def add_batch(self, ids, vectors) -> int:
        vecs = np.asarray(vectors, dtype=np.float32)
        if vecs.ndim != 2 or vecs.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}] batch")
        with self.lock:
            # Fast path: all-new ids appended contiguously.
            new_mask = [i not in self._id_to_row for i in ids]
            if all(new_mask) and len(set(ids)) == len(ids):
                n = len(ids)
                self._ensure_capacity(self._count + n)
                s = self._count
                self._vecs[s : s + n] = vecs
                self._alive[s : s + n] = True
                for off, i in enumerate(ids):
                    self._row_ids[s + off] = i
                    self._id_to_row[i] = s + off
                self._count += n
                self._live += n
                self._mark_all_dirty()
                return n
            return super().add_batch(ids, vecs)

    # ---- device sync ----------------------------------------------------

    def _sync(self) -> dict:
        if self._dev is not None and not self._dirty:
            return self._dev
        with self.lock:
            return self._sync_locked()

    def _sync_locked(self) -> dict:
        if self._dev is not None and not self._dirty:
            return self._dev  # another thread synced while we waited
        # incremental path: a few mutated rows scatter into the existing
        # device slab (device-side copy, tiny H2D) instead of re-uploading
        # the whole capacity-padded slab per mutation
        if self._dev is not None and self._dirty_rows:
            return self._sync_incremental()
        vf = self._vecs  # lock held: no concurrent mutation during upload
        sqnorm = np.einsum("nd,nd->n", vf, vf).astype(np.float32)
        alive = self._alive
        if self.storage == "sq8":
            codes, mins, scales = sq8_quantize(vf)
            deq = mins[:, None] + codes.astype(np.float32) * scales[:, None]
            sq_approx = np.einsum("nd,nd->n", deq, deq).astype(np.float32)
            self._dev = {
                "codes": upload_rows(codes),
                "mins": jnp.asarray(mins.astype(np.float32)),
                "scales": jnp.asarray(scales.astype(np.float32)),
                "sqnorm": jnp.asarray(sq_approx),
                "alive": jnp.asarray(alive),
            }
        else:
            dt = _STORAGE_DTYPES[self.storage]
            dev = {
                "vecs": upload_rows(vf, dtype=dt),
                "sqnorm": jnp.asarray(sqnorm),
                "alive": jnp.asarray(alive),
            }
            if self._hybrid:
                # twin bf16 scan slab next to the fp32 rerank slab (+50%
                # device memory; the scan then streams half the HBM bytes)
                dev["vecs16"] = upload_rows(vf, dtype=jnp.bfloat16)
            self._dev = dev
        self._dirty = False
        self._dirty_rows = set()
        return self._dev

    def _sync_incremental(self) -> dict:
        # Runs under self.lock (every mutator holds it too). Publish a NEW
        # dev dict only after all arrays are updated and clear _dirty LAST,
        # so the unlocked _sync fast path in a concurrent reader sees either
        # the fully-old or fully-new view, never a torn one (r2 review).
        dirty = self._dirty_rows
        rows = np.fromiter(dirty, np.int64, len(dirty))
        vf = self._vecs[rows]
        idx = jnp.asarray(rows, jnp.int32)
        alive = jnp.asarray(self._alive[rows])
        old = self._dev
        new = dict(old)
        if self.storage == "sq8":
            codes, mins, scales = sq8_quantize(vf)
            deq = mins[:, None] + codes.astype(np.float32) * scales[:, None]
            sq = np.einsum("nd,nd->n", deq, deq).astype(np.float32)
            new["codes"], new["mins"], new["scales"], new["sqnorm"], new["alive"] = (
                _scatter5(
                    old["codes"], old["mins"], old["scales"], old["sqnorm"],
                    old["alive"], idx, jnp.asarray(codes),
                    jnp.asarray(mins.astype(np.float32)),
                    jnp.asarray(np.where(scales > 0, scales, 0.0).astype(np.float32)),
                    jnp.asarray(sq), alive,
                )
            )
        elif self._hybrid:
            sq = np.einsum("nd,nd->n", vf, vf).astype(np.float32)
            new["vecs"], new["vecs16"], new["sqnorm"], new["alive"] = _scatter4(
                old["vecs"], old["vecs16"], old["sqnorm"], old["alive"],
                idx, jnp.asarray(vf), jnp.asarray(sq), alive,
            )
        else:
            dt = _STORAGE_DTYPES[self.storage]
            sq = np.einsum("nd,nd->n", vf, vf).astype(np.float32)
            new["vecs"], new["sqnorm"], new["alive"] = _scatter3(
                old["vecs"], old["sqnorm"], old["alive"],
                idx, jnp.asarray(vf, dtype=dt), jnp.asarray(sq), alive,
            )
        self._dev = new
        self._dirty = False
        self._dirty_rows = set()
        return new

    # ---- query ----------------------------------------------------------

    def _search_device(
        self, q: jax.Array, top_k: int, max_scans: Optional[int]
    ) -> tuple[jax.Array, jax.Array]:
        """Device-level query: q [B, D] -> (scores [B, k], rows [B, k]).
        Rows are slab positions; -1 marks missing hits."""
        dev = self._sync()
        ms_int = self._count if max_scans is None else min(max_scans, self._count)
        ms = device_i32(ms_int)
        if self.storage == "sq8":
            fn = _sq8_search_fn(self.metric, top_k, self.compute_dtype, self.selection)
            return fn(dev["codes"], dev["mins"], dev["scales"], dev["sqnorm"],
                      dev["alive"], q, ms)
        if self._hybrid and q.shape[0] <= HYBRID_MAX_BATCH:
            from pyrope_tpu.ops.scalars import device_i32x1
            from pyrope_tpu.ops.topk import parse_selection
            from pyrope_tpu.utils.shapes import next_pow2

            b = q.shape[0]
            # batch_tile 64, not 128: the R-wide bitonic merge's tile-sort
            # temporaries put the [128, 4096] variant 1.37M over the 16M
            # scoped-vmem stack under jit (measured AOT OOM on v5e)
            bt = min(next_pow2(max(b, 8)), 64)
            qp = jnp.pad(q, ((0, bt - b % bt), (0, 0))) if b % bt else q
            from pyrope_tpu.ops.pallas_scan import pick_row_tile

            rt = pick_row_tile(self._cap, self.dim, "bfloat16")
            r = hybrid_shortlist(top_k, parse_selection(self.selection)[1], rt)
            fn = _hybrid_search_fn(self.metric, top_k, r, rt, bt)
            vals, rows = fn(dev["vecs"], dev["vecs16"], dev["sqnorm"],
                            dev["alive"], qp, device_i32x1(ms_int))
            return vals[:b], rows[:b]
        if ((self.selection == "pallas" or self._hybrid)
                and self.metric != Metric.COSINE):
            # fused scan+running-top-k kernel (ops/pallas_scan.py): exact,
            # no [B, N] score materialization; beats the XLA path at N >= ~1M.
            # Hybrid batches ABOVE the crossover land here too: at b1024 the
            # R-wide bitonic merge costs more than the fp32 slab's extra
            # bandwidth+passes (measured same-day 52k vs 109k QPS at 262k),
            # and this fp32 scan is exact by construction
            from pyrope_tpu.ops.pallas_scan import (
                pallas_flat_topk,
                pick_row_tile,
            )
            from pyrope_tpu.utils.shapes import next_pow2

            b = q.shape[0]
            # batch_tile 128 halves slab HBM re-streams vs 64 at serving
            # batches (measured same-day: kernel 5.22 ms vs 5.46 ms at
            # b1024/100k); 128 is the VMEM ceiling at row_tile 4096
            bt = min(next_pow2(max(b, 8)), 128)
            qp = jnp.pad(q, ((0, bt - b % bt), (0, 0))) if b % bt else q
            rt = pick_row_tile(self._cap, self.dim, str(dev["vecs"].dtype))
            vals, rows = pallas_flat_topk(
                qp, dev["vecs"], dev["sqnorm"], dev["alive"], ms_int, top_k,
                self.metric, row_tile=rt, batch_tile=bt,
            )
            # drop pad rows: every selection mode returns [B, k]
            return vals[:b], rows[:b]
        sel = self.selection
        if sel.partition(":")[0] == "hybrid":
            sel = "exact"  # COSINE hybrid fallback: the XLA path IS exact
        fn = _dense_search_fn(self.metric, top_k, self.compute_dtype, sel)
        return fn(dev["vecs"], dev["sqnorm"], dev["alive"], q, ms)

    def device_search(
        self, q: jax.Array, top_k: int,
        options: SearchOptions = DEFAULT_SEARCH_OPTIONS,
    ) -> tuple[jax.Array, jax.Array]:
        """Device-resident query path: q [B, D] on device -> device
        (scores [B, k], slab rows [B, k]); no host synchronization. This is
        the hot path for pipelined/async serving (host round-trips through
        the TPU tunnel cost ~ms; see bench.py)."""
        return self._search_device(q, top_k, options.max_scans)

    def resolve_rows(self, rows: np.ndarray) -> list[list[str]]:
        """Map slab rows (from device_search) to external ids; '' = no hit."""
        return [
            [self._row_ids[int(r)] or "" if r >= 0 else "" for r in row]
            for row in rows
        ]

    def search_batch(
        self,
        queries: np.ndarray,
        top_k: int,
        options: SearchOptions = DEFAULT_SEARCH_OPTIONS,
    ) -> list[list[SearchResult]]:
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: expected {self.dim}, got {q.shape[1]}")
        b = q.shape[0]
        bb = batch_bucket(b)
        if bb != b:
            q = np.pad(q, ((0, bb - b), (0, 0)))
        vals, rows = self._search_device(jnp.asarray(q), top_k, options.max_scans)
        return self._to_results(np.asarray(vals)[:b], np.asarray(rows)[:b])

    def _to_results(self, vals: np.ndarray, rows: np.ndarray) -> list[list[SearchResult]]:
        out: list[list[SearchResult]] = []
        for vrow, rrow in zip(vals, rows):
            hits = []
            for v, r in zip(vrow, rrow):
                if r < 0 or not np.isfinite(v):
                    continue
                rid = self._row_ids[int(r)]
                if rid is not None:
                    hits.append(SearchResult(rid, float(v)))
            out.append(hits)
        return out

    # ---- lifecycle ------------------------------------------------------

    def scan(self) -> Iterator[tuple[str, np.ndarray]]:
        for row in range(self._count):
            if self._alive[row] and self._row_ids[row] is not None:
                yield self._row_ids[row], self._vecs[row].copy()

    def get_stats(self) -> IndexStats:
        return IndexStats(count=self._live, dim=self.dim, metric=self.metric)

    def snapshot(self, path: str) -> None:
        # hold the lock: an in-place concurrent upsert would otherwise tear
        # a row mid-serialization (mutators write self._vecs[row] directly)
        with self.lock:
            self._snapshot_locked(path)

    def _snapshot_locked(self, path: str) -> None:
        live_rows = [r for r in range(self._count) if self._alive[r]]
        ids = np.array([self._row_ids[r] for r in live_rows], dtype=np.str_)
        vecs = self._vecs[live_rows] if live_rows else np.zeros((0, self.dim), np.float32)
        meta = json.dumps({
            "format": "pyrope_tpu.flat.v1",
            "dim": self.dim,
            "metric": self.metric.value,
            "storage": self.storage,
        })
        np.savez_compressed(path, meta=np.str_(meta), ids=ids, vecs=vecs)

    def load(self, path: str) -> None:
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
            if meta.get("format") != "pyrope_tpu.flat.v1":
                raise ValueError(f"bad snapshot format: {meta.get('format')}")
            if int(meta["dim"]) != self.dim:
                raise ValueError("snapshot dim mismatch")
            ids = [str(s) for s in z["ids"]]
            vecs = np.asarray(z["vecs"], np.float32)
        # adopt the snapshot's metric/storage (matching the other families;
        # previously a COSINE snapshot loaded into an L2 index silently
        # changed scoring semantics)
        self.metric = Metric.parse(meta["metric"])
        self.storage = meta.get("storage", self.storage)
        self._clear()
        if ids:
            self.add_batch(ids, vecs)

    def describe_scan(self, batch: int | None = None,
                      nprobe: int | None = None) -> str:
        """Which kernel a query runs (bench rows record this so a QPS
        number is never quoted without its code path — VERDICT r2)."""
        if self.storage == "sq8":
            return "flat-sq8"
        if self._hybrid:
            if batch is not None and batch > HYBRID_MAX_BATCH:
                return "flat-pallas"  # fp32 scan above the hybrid crossover
            return "flat-pallas-hybrid"
        if self.selection == "pallas" and self.metric != Metric.COSINE:
            return "flat-pallas"
        mode = self.selection.partition(":")[0]
        if mode == "hybrid":
            return "flat-exact"  # COSINE hybrid fallback runs the XLA exact scan
        return f"flat-{mode}"

    # ---- internals exposed for composite indexes ------------------------

    @property
    def capacity(self) -> int:
        return self._cap

    def live_vectors(self) -> tuple[list[str], np.ndarray]:
        """(ids, vectors) of live rows, in insertion order.

        When every row is live (the bulk-load-then-build case) the vectors
        are a read-only VIEW of the internal slab, not a copy — on this
        host, first-touch page faults make a fresh 512 MB copy cost tens
        of seconds (see ops/transfer.py). Callers must not mutate it."""
        n = self._count
        if n == 0:
            return [], np.zeros((0, self.dim), np.float32)
        alive = self._alive[:n]
        if alive.all():
            return list(self._row_ids[:n]), self._vecs[:n]
        rows = np.flatnonzero(alive)
        ids = [self._row_ids[int(r)] for r in rows]
        return ids, self._vecs[rows]
