"""Query-sharded HNSW: replicated graph, query batch split over the mesh.

The HNSW beam search is a per-query graph walk — there is no corpus axis to
shard cheaply (splitting the graph would need cross-shard neighbor hops
every step, i.e. an all-to-all per beam iteration over ICI). The idiomatic
TPU layout is therefore **replicate the graph, shard the queries**: each
device runs the identical batched beam program (index/hnsw.py
beam_search_body) on its slice of the batch; no collectives are needed and
throughput scales linearly with devices. Memory bound: the graph (vectors +
int32 adjacency) must fit one device — at m=16/dim=128 that is ~45M vectors
per 16 GB chip; corpora beyond that belong to sharded IVF/IVF-PQ
(SURVEY §5.8: the reference has NO distribution story at all).

Completes the sharded family matrix from VERDICT r1 #6.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyrope_tpu.index.hnsw import HnswIndex, beam_schedule, beam_search_body
from pyrope_tpu.ops.scalars import device_i32
from pyrope_tpu.parallel.mesh import DATA_AXIS, default_mesh
from pyrope_tpu.types import (
    DEFAULT_SEARCH_OPTIONS,
    Metric,
    SearchOptions,
    SearchResult,
)
from pyrope_tpu.utils.shapes import round_up


def make_sharded_hnsw_search(
    mesh: Mesh, metric: Metric, k: int, pool: int, steps: int, n_upper: int,
    axis: str = DATA_AXIS, rerank: bool = False,
):
    """shard_map over the query batch: graph arrays replicated, q sharded
    over ``axis``, per-device beam, outputs sharded (no collectives)."""
    body = functools.partial(
        beam_search_body, metric=metric, k=k, pool=pool, steps=steps,
        n_upper=n_upper, rerank=rerank,
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, None), P(None, None), P(None), P(None, None),
            P(None, None, None), P(None), P(),
            P(axis, None),                        # queries sharded
        ),
        out_specs=(P(axis, None), P(axis, None)),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedHnswIndex(HnswIndex):
    """HnswIndex whose query batches fan out over a device mesh. Host API
    and graph construction identical to HnswIndex; batches are padded to a
    mesh-size multiple before dispatch."""

    def __init__(
        self,
        dim: int,
        metric: Metric | str = Metric.L2,
        *,
        mesh: Optional[Mesh] = None,
        m: int = 16,
        ef_construction: int = 200,
        ef_search: int = 10,
        seed: int = 42,
        neighbor_heuristic: bool = True,
        search_dtype: str = "float32",
    ):
        self.mesh = mesh if mesh is not None else default_mesh()
        self._ndev = self.mesh.devices.size
        super().__init__(
            dim, metric, m=m, ef_construction=ef_construction,
            ef_search=ef_search, seed=seed,
            neighbor_heuristic=neighbor_heuristic,
            search_dtype=search_dtype,
        )
        self._fn_cache: dict = {}

    def _replicated(self, dev: dict) -> dict:
        """Pin graph arrays to an explicitly replicated sharding on the
        mesh (host-built numpy uploads land on device 0 otherwise)."""
        if dev.get("_mesh_replicated"):
            return dev
        rep = NamedSharding(self.mesh, P())
        # in fp32 mode x_exact IS x — replicate the slab once and alias,
        # not twice (the vector slab dominates: 512 MB at 1M x 128 fp32)
        x_aliases_exact = dev["x_exact"] is dev["x"]
        for key in ("x", "x_exact", "sqnorm", "adj0", "adj_up", "alive"):
            if key == "x_exact" and x_aliases_exact:
                dev[key] = dev["x"]
                continue
            dev[key] = jax.device_put(dev[key], rep)
        dev["_mesh_replicated"] = True
        return dev

    def device_search(
        self, q: jax.Array, top_k: int,
        options: SearchOptions = DEFAULT_SEARCH_OPTIONS,
    ) -> tuple[jax.Array, jax.Array]:
        if self._count == 0 or self._entry < 0:
            raise RuntimeError("device_search on empty index")
        b = q.shape[0]
        if b % self._ndev:
            raise ValueError(
                f"query batch {b} must be a multiple of the mesh size "
                f"{self._ndev} (search_batch pads automatically)"
            )
        ef = options.ef_search or self.ef_search
        pool, steps = beam_schedule(ef, top_k)
        dev = self._replicated(self._sync())
        axis = self.mesh.axis_names[0]
        rerank = self.search_dtype == "bfloat16"
        key = (top_k, pool, steps, dev["n_upper"], self.metric, axis, rerank)
        fn = self._fn_cache.get(key)
        if fn is None:
            search_metric = (
                Metric.INNER_PRODUCT if self.metric == Metric.COSINE else self.metric
            )
            fn = self._fn_cache[key] = make_sharded_hnsw_search(
                self.mesh, search_metric, top_k, pool, steps, dev["n_upper"],
                axis=axis, rerank=rerank,
            )
        return fn(
            dev["x"], dev["x_exact"], dev["sqnorm"], dev["adj0"],
            dev["adj_up"], dev["alive"], device_i32(self._entry), q,
        )

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
        if self._count == 0 or self._entry < 0:
            return [[] for _ in range(q.shape[0])]
        if self.metric == Metric.COSINE:
            norms = np.linalg.norm(q, axis=1, keepdims=True)
            q = q / np.maximum(norms, 1e-12)
        b = q.shape[0]
        bb = round_up(b, self._ndev)
        qp = np.pad(q, ((0, bb - b), (0, 0))) if bb != b else q
        vals, rows = self.device_search(jnp.asarray(qp), top_k, options)
        vals = np.asarray(vals)[:b]
        rows = np.asarray(rows)[:b]
        out: list[list[SearchResult]] = []
        for bi in range(b):
            hits = []
            for v, r in zip(vals[bi], rows[bi]):
                if r < 0 or not np.isfinite(v):
                    continue
                rid = self._row_ids[int(r)]
                if rid is not None:
                    hits.append(SearchResult(rid, float(v)))
            out.append(hits)
        return out
