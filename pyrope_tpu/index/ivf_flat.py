"""IVF-Flat index: coarse k-means + exact scans of probed inverted lists.

Rebuild of the reference's ``IvfFlatVectorIndex``
(ref: src/Pyrope.GarnetServer/Vector/IvfFlatVectorIndex.cs):

- pre-build writes land in a mutable buffer, searched exactly (:17,39-54,
  :170-180); here the buffer is a FlatIndex
- ``build()`` merges main + buffer, runs k-means (k = min(nlist, N), seed 42)
  and assigns rows to inverted lists (:85-145)
- query ranks all centroids, probes the top ``nprobe`` (default 3,
  ``CombineNProbe`` :14) lists, honors ``max_scans``/``nprobe`` overrides
  (:151-158, 183-219)
- exposes centroids post-build (:314-325, ICentroidsProvider)

TPU layout: rows are permuted cluster-major into one contiguous slab (CSR:
offsets + lengths). Two scan kernels share identical probe semantics:

- ``probe`` (sparse): per-probe contiguous dynamic-slice of the slab +
  [B, L_pad] score kernel with a running top-k merge. Work scales with
  nprobe·L_pad, but the per-query slicing replicates HBM traffic B times —
  it only pays off when the probed fraction is tiny relative to N.
- ``dense``: ONE full [B, N] score matmul (the flat kernel, MXU-streamed)
  masked by cluster membership — row r survives iff its cluster is in the
  query's probe set and its within-list position is inside the max_scans
  budget. Measured on a v5e at batch 1024 / 100k×128: nprobe=3 49k→168k
  QPS, nprobe=96 1.5k→141k QPS vs the sparse kernel, with bit-identical
  hit sets. Default ``scan_mode="auto"`` picks dense whenever the full
  matmul is cheaper than the gather blowup.

Invariant: an id lives either in the built main slab or in the buffer,
never both (upsert tombstones the main row first), so merges need no dedup.
"""

from __future__ import annotations

import functools
import json
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

from pyrope_tpu.ops.scalars import device_i32
import numpy as np

from pyrope_tpu.index.base import CentroidsProvider, VectorIndex
from pyrope_tpu.index.flat import HYBRID_MAX_BATCH, FlatIndex
from pyrope_tpu.ops.distance import score_matrix
from pyrope_tpu.ops.kmeans import kmeans_build
from pyrope_tpu.ops.topk import masked_topk, merge_topk
from pyrope_tpu.ops.transfer import upload_rows
from pyrope_tpu.types import (
    DEFAULT_SEARCH_OPTIONS,
    IndexStats,
    Metric,
    SearchOptions,
    SearchResult,
)
from pyrope_tpu.utils.shapes import batch_bucket, round_up

DEFAULT_NPROBE = 3  # ref: IvfFlatVectorIndex.cs:14 CombineNProbe = 3

# auto scan-mode thresholds (see pick_scan_mode)
DENSE_MAX_ROWS = 262_144   # a full matmul over this many rows is trivially cheap
DENSE_TILE_B = 256         # ~queries amortizing one slab pass in the dense matmul
DENSE_MARGIN = 2           # require probe traffic >= 2x dense before switching
# The XLA dense kernel transiently materializes [B, npad] fp32 scores plus
# an int32 allowed_row gather and a bool mask (~9 B/element); cap the
# product so an unusual batch bucket cannot OOM the chip (2^28 elements
# ≈ 2.4 GB transient — comfortable on a 16 GB v5e).
DENSE_MAX_ELEMS = 1 << 28


def pick_scan_mode(
    scan_mode: str, npad: int, nprobe: int, l_pad: int, batch: int = 64,
    pallas_ok: bool = False,
) -> str:
    """Resolve 'auto' to 'dense' or 'probe' by HBM-traffic model.

    The sparse kernel's per-query dynamic-slice replicates probed rows per
    query: traffic ∝ batch·nprobe·l_pad rows. The dense matmul streams the
    whole slab once per ~DENSE_TILE_B queries: traffic ∝ npad·ceil(B/tile)
    rows. Measured v5e crossovers (100k: dense 3-91x faster at any nprobe;
    1M nlist=1000 nprobe=3 small-batch: probe wins) sit on this model with
    a 2x safety margin toward probe.

    ``pallas_ok``: the caller established this (batch, shape) is eligible
    for the FUSED Pallas dense kernel, which streams corpus tiles with a
    [B, k] VMEM running top-k and never materializes [B, npad] — the
    DENSE_MAX_ELEMS OOM guard exists only for the XLA dense fallback's
    transients, so it does not demote eligible batches (measured: b4096 at
    100k demoted to probe ran 1.46k QPS vs 203k for the fused dense path
    at b1024).
    """
    if scan_mode != "auto":
        return scan_mode
    if not pallas_ok and batch * npad > DENSE_MAX_ELEMS:
        return "probe"  # [B, npad] transients would not fit (see cap above)
    if npad <= DENSE_MAX_ROWS:
        return "dense"
    dense_traffic = npad * -(-batch // DENSE_TILE_B)
    if batch * nprobe * l_pad >= DENSE_MARGIN * dense_traffic:
        return "dense"
    return "probe"


def slab_pad(n: int, l_pad: int) -> int:
    """Padded slab length: tail pad so every probe slice stays in range,
    rounded to a Pallas-tile-friendly multiple (the fused dense kernel needs
    npad % row_tile == 0; extra rows are alive=False so every path ignores
    them)."""
    npad = round_up(n, 8) + l_pad
    return int(round_up(npad, 4096) if npad > 4096 else round_up(npad, 128))


def rank_probes(q, cents, cvalid, offsets, lens, nprobe, max_scans, metric, cdtype):
    """Rank centroids, pick the top-nprobe lists, and compute each probe's
    effective scan length under the max_scans budget (ref :183-219).
    Returns (probe [B, nprobe] list ids, offs_p, eff)."""
    cscores = score_matrix(q, cents, metric, compute_dtype=cdtype)
    cscores = jnp.where(cvalid[None, :], cscores, -jnp.inf)
    _, probe = jax.lax.top_k(cscores, nprobe)
    lens_p = lens[probe]
    offs_p = offsets[probe]
    before = jnp.cumsum(lens_p, axis=1) - lens_p          # rows scanned earlier
    budget = jnp.maximum(max_scans - before, 0)
    eff = jnp.minimum(lens_p, budget)                     # ref: break at MaxScans
    return probe, offs_p, eff


def scan_probed_lists(
    xperm, sqnorm, alive, q, offs_p, eff,
    *, k: int, l_pad: int, metric: Metric, cdtype, prec, row_base=0,
):
    """Scan every probed list slice with a running top-k merge. Each probe
    is a contiguous dynamic-slice of the cluster-major slab (pure DMA) plus
    one [B, L_pad] score einsum. ``row_base`` offsets emitted row ids (the
    sharded scan passes shard*stride so candidates stay globally unique).

    Shared by the single-chip IVF-Flat kernel and the shard_map'd
    multi-chip kernel (pyrope_tpu/parallel/sharded_ivf.py)."""
    b = q.shape[0]
    nprobe = offs_p.shape[1]
    qf = q.astype(jnp.float32)
    qq = jnp.sum(qf * qf, axis=-1)
    qn = jnp.sqrt(jnp.maximum(qq, 1e-24))
    j = jax.lax.broadcasted_iota(jnp.int32, (1, l_pad), 1)

    vals = jnp.full((b, k), -jnp.inf, jnp.float32)
    gidx = jnp.full((b, k), -1, jnp.int32)
    for p in range(nprobe):
        off = offs_p[:, p]
        blocks = jax.vmap(
            lambda o: jax.lax.dynamic_slice(xperm, (o, 0), (l_pad, xperm.shape[1]))
        )(off)                                             # [B, L_pad, D]
        sq = jax.vmap(lambda o: jax.lax.dynamic_slice(sqnorm, (o,), (l_pad,)))(off)
        alv = jax.vmap(lambda o: jax.lax.dynamic_slice(alive, (o,), (l_pad,)))(off)
        if cdtype is not None:
            dots = jnp.einsum(
                "bld,bd->bl", blocks.astype(cdtype), q.astype(cdtype),
                preferred_element_type=jnp.float32,
            )
        else:
            dots = jnp.einsum(
                "bld,bd->bl", blocks, qf,
                preferred_element_type=jnp.float32, precision=prec,
            )
        if metric == Metric.L2:
            scores = -jnp.maximum(qq[:, None] - 2.0 * dots + sq, 0.0)
        elif metric == Metric.INNER_PRODUCT:
            scores = dots
        else:  # COSINE
            xn = jnp.sqrt(jnp.maximum(sq, 1e-24))
            scores = dots / jnp.maximum(qn[:, None] * xn, 1e-12)
        mask = (j < eff[:, p : p + 1]) & alv
        svals = jnp.where(mask, scores, -jnp.inf)
        rows = row_base + off[:, None] + j
        vals, gidx = merge_topk(vals, gidx, svals, rows, k)
    return vals, gidx


def dense_probe_mask(probe, eff, crow, pos, alive, kpad):
    """[B, N] mask of rows inside a probed list AND inside its max_scans
    budget: build an allowed-length table [B, kpad] (scatter eff at the
    probed list ids), read it back per-row through the static cluster-of-row
    map, and compare against each row's static within-list position.

    Shared by the single-chip dense kernel and the shard_map'd sharded-IVF
    dense kernel (pyrope_tpu/parallel/sharded_ivf.py)."""
    b = probe.shape[0]
    allowed = jnp.zeros((b, kpad), jnp.int32)
    allowed = allowed.at[jnp.arange(b)[:, None], probe].set(eff)
    allowed_row = allowed[:, crow]                        # [B, N] gather, shared idx
    return (pos[None, :] < allowed_row) & alive[None, :]


@functools.lru_cache(maxsize=None)
def _ivf_dense_fn(metric: Metric, k: int, nprobe: int, compute: str | None):
    cdtype = None if compute is None else jnp.dtype(compute)

    @jax.jit
    def fn(cents, cvalid, xperm, sqnorm, alive, offsets, lens, crow, pos, q, max_scans):
        probe, _, eff = rank_probes(
            q, cents, cvalid, offsets, lens, nprobe, max_scans, metric, cdtype
        )
        mask = dense_probe_mask(probe, eff, crow, pos, alive, cents.shape[0])
        scores = score_matrix(q, xperm, metric, x_sqnorm=sqnorm, compute_dtype=cdtype)
        # masked_topk pads when k exceeds the slab (matches the probe kernel)
        return masked_topk(jnp.where(mask, scores, -jnp.inf), None, k)

    return fn


def probed_table(probe: jax.Array, kpad: int) -> jax.Array:
    """[B, nprobe] probe ids -> [B, Kp] 0/1 fp32 table (Kp lane-padded for
    the fused kernel's membership matmul)."""
    b = probe.shape[0]
    kp = int(round_up(kpad, 128))
    return jnp.zeros((b, kp), jnp.float32).at[
        jnp.arange(b)[:, None], probe
    ].set(1.0)


def probed_table_t(probe: jax.Array, kpad: int, window: int) -> jax.Array:
    """[B, nprobe] probe ids -> TRANSPOSED [Kp, B] 0/1 bf16 table for the
    windowed kernel (Kp from ops/pallas_scan.padded_probe_width: aligned
    multiple of window's Mosaic alignment, >= window, so every aligned
    [c0, c0+window) slice is in range; bf16 0/1 products are exact,
    accumulate is fp32)."""
    from pyrope_tpu.ops.pallas_scan import padded_probe_width

    b = probe.shape[0]
    kp = padded_probe_width(kpad, window)
    return jnp.zeros((kp, b), jnp.bfloat16).at[
        probe, jnp.arange(b)[:, None]
    ].set(1.0)


@functools.lru_cache(maxsize=None)
def _ivf_dense_pallas_fn(metric: Metric, k: int, nprobe: int,
                         promote: bool = False,
                         probe_metric: Metric | None = None):
    """Fused dense-mask scan: rank probes in XLA (tiny), then ONE Pallas
    pass that streams the slab, masks by probe membership in-kernel, and
    keeps a running top-k in VMEM — no [B, N] score/mask materialization
    (see ops/pallas_scan.pallas_ivf_topk). Full-scan semantics only: callers
    route max_scans budgets to the XLA kernels."""
    from pyrope_tpu.ops.pallas_scan import pallas_ivf_topk, pick_row_tile

    @jax.jit
    def fn(cents, cvalid, xperm, sqnorm, alive, offsets, lens, crow, q, max_scans):
        probe, _, _ = rank_probes(
            q, cents, cvalid, offsets, lens, nprobe, max_scans,
            probe_metric or metric, None,
        )
        probed = probed_table(probe, cents.shape[0])
        b = q.shape[0]
        # fp32-based tile regardless of slab dtype: must match the grid
        # tile_cluster_windows used in _tables (fp32 is the widest slab)
        rt = pick_row_tile(xperm.shape[0], xperm.shape[1], "float32")
        return pallas_ivf_topk(
            q, xperm, sqnorm, alive, crow, probed, k, metric,
            promote_fp32=promote,
            row_tile=rt, batch_tile=min(128, b),
        )

    return fn


@functools.lru_cache(maxsize=None)
def _ivf_dense_pallas_win_fn(metric: Metric, k: int, nprobe: int,
                             promote: bool = False,
                             probe_metric: Metric | None = None):
    """Windowed fused dense-mask scan for wide cluster tables
    (kpad > PALLAS_IVF_MAX_KPAD): membership is resolved against a
    per-tile window of the cluster-major slab's cluster band instead of
    the full [row_tile, kpad] one-hot (see
    ops/pallas_scan.pallas_ivf_topk_windowed)."""
    from pyrope_tpu.ops.pallas_scan import (
        PALLAS_IVF_WINDOW,
        pallas_ivf_topk_windowed,
        pick_row_tile,
    )

    @jax.jit
    def fn(cents, cvalid, xperm, sqnorm, alive, offsets, lens, crow,
           tile_clo, q, max_scans):
        probe, _, _ = rank_probes(
            q, cents, cvalid, offsets, lens, nprobe, max_scans,
            probe_metric or metric, None,
        )
        probed_t = probed_table_t(probe, cents.shape[0], PALLAS_IVF_WINDOW)
        b = q.shape[0]
        # fp32-based tile: must match the grid tile_clo was built for
        rt = pick_row_tile(xperm.shape[0], xperm.shape[1], "float32")
        return pallas_ivf_topk_windowed(
            q, xperm, sqnorm, alive, crow, probed_t, tile_clo, k, metric,
            promote_fp32=promote,
            row_tile=rt, batch_tile=min(128, b),
        )

    return fn


@functools.lru_cache(maxsize=None)
def _ivf_dense_pallas_hybrid_fn(metric: Metric, k: int, r: int, nprobe: int,
                                windowed: bool = False,
                                probe_metric: Metric | None = None):
    """Hybrid dense scan: the fused kernel streams the bf16 twin slab and
    keeps each query's top-R shortlist, then rerank_exact rescores those
    R rows off the fp32 slab with Precision.HIGHEST — matches the fp32
    dense scan WITH HIGH PROBABILITY at near-bf16 scan cost (the PQ-refine
    pattern applied to the exact IVF path). Not exact by construction:
    more than R−k near-ties within bf16 rounding of the kth score can push
    a true neighbor outside the shortlist — see
    index/flat._hybrid_search_fn for the failure regime and mitigations."""
    from pyrope_tpu.ops.distance import rerank_exact
    from pyrope_tpu.ops.pallas_scan import (
        PALLAS_IVF_WINDOW,
        pallas_ivf_topk,
        pallas_ivf_topk_windowed,
        pick_row_tile,
    )

    @jax.jit
    def fn(cents, cvalid, xperm, xperm16, sqnorm, alive, offsets, lens, crow,
           tile_clo, q, max_scans):
        probe, _, _ = rank_probes(
            q, cents, cvalid, offsets, lens, nprobe, max_scans,
            probe_metric or metric, None,
        )
        b = q.shape[0]
        # fp32-based tile even on the bf16 twin slab: the windowed variant
        # shares tile_clo with the fp32 kernels, so the grids must agree
        rt = pick_row_tile(xperm16.shape[0], xperm16.shape[1], "float32")
        # 64 not 128: the R-wide bitonic merge OOMs the 16M scoped-vmem
        # stack at batch_tile 128 under jit (see index/flat.py hybrid path)
        bt = min(64, b)
        if windowed:
            probed_t = probed_table_t(probe, cents.shape[0], PALLAS_IVF_WINDOW)
            _, rows = pallas_ivf_topk_windowed(
                q, xperm16, sqnorm, alive, crow, probed_t, tile_clo, r,
                metric, row_tile=rt, batch_tile=bt,
            )
        else:
            probed = probed_table(probe, cents.shape[0])
            _, rows = pallas_ivf_topk(
                q, xperm16, sqnorm, alive, crow, probed, r, metric,
                row_tile=rt, batch_tile=bt,
            )
        return rerank_exact(xperm, sqnorm, q, rows, k, metric)

    return fn


_cast_bf16 = jax.jit(lambda a: a.astype(jnp.bfloat16))


def pallas_dense_ok(selection: str, metric: Metric, compute: str | None,
                    npad: int, kpad: int, b: int, ms: int, n: int,
                    win_ok: bool = False, dim: int = 128) -> bool:
    """Eligibility of the fused Pallas dense kernel (falls back to the XLA
    dense kernel otherwise): full scan only (no max_scans budget), L2/IP,
    exact fp32 compute, tile-divisible shapes, and a cluster table narrow
    enough that the membership matmul stays a fraction of the scan —
    wider tables are eligible when the slab's per-tile cluster spans fit
    the windowed kernel (``win_ok``, see tile_cluster_windows).

    Divisibility is checked against the SAME row tile the kernels will
    pick (``pick_row_tile`` shrinks below 4096 for dim > 256 to fit the
    scoped-vmem budget) — checking min(4096, npad) while the kernel tiles
    smaller crashed dim=768 capacity buckets at query time."""
    from pyrope_tpu.ops.pallas_scan import PALLAS_IVF_MAX_KPAD, pick_row_tile

    if selection == "exact":
        return False
    return (
        metric != Metric.COSINE
        and compute is None
        and ms >= n
        and (kpad <= PALLAS_IVF_MAX_KPAD or win_ok)
        and npad % pick_row_tile(npad, dim, "float32") == 0
        and b % min(128, b) == 0
    )


@functools.lru_cache(maxsize=None)
def _ivf_search_fn(metric: Metric, k: int, nprobe: int, l_pad: int, compute: str | None):
    cdtype = None if compute is None else jnp.dtype(compute)
    prec = jax.lax.Precision.HIGHEST if compute is None else None

    @jax.jit
    def fn(cents, cvalid, xperm, sqnorm, alive, offsets, lens, q, max_scans):
        _, offs_p, eff = rank_probes(
            q, cents, cvalid, offsets, lens, nprobe, max_scans, metric, cdtype
        )
        return scan_probed_lists(
            xperm, sqnorm, alive, q, offs_p, eff,
            k=k, l_pad=l_pad, metric=metric, cdtype=cdtype, prec=prec,
        )

    return fn


class IvfFlatIndex(VectorIndex, CentroidsProvider):
    @property
    def host_write_cheap(self) -> bool:  # see IVectorIndex
        # writes land in the Flat buffer; cheap while it needs no realloc
        return self._buffer.host_write_cheap

    def __init__(
        self,
        dim: int,
        metric: Metric | str = Metric.L2,
        *,
        nlist: int = 100,  # ref default nlist 100
        nprobe: int = DEFAULT_NPROBE,
        compute_dtype: Optional[str] = None,
        seed: int = 42,    # ref: IvfFlatVectorIndex k-means seed 42
        train_dtype: Optional[str] = None,
        scan_mode: str = "auto",
        train_init: str = "kmeans++",  # | "sample" (the reference's init)
        selection: str = "auto",
    ):
        """``compute_dtype`` governs SEARCH scans (None = exact fp32
        HIGHEST, the CLAUDE.md invariant). ``train_dtype`` governs k-means
        TRAINING matmuls only — bf16 is ~6x MXU throughput and perturbs only
        which list a boundary row lands in, not search exactness; None
        restores bit-stable fp32 training. ``scan_mode`` picks the probed
        scan kernel: 'auto' | 'dense' | 'probe' (see module docstring —
        both produce identical hit sets). ``selection``: 'auto' routes
        eligible dense scans through the fused Pallas kernel (identical hit
        sets, no [B, N] materialization); 'pallas' requires it; 'exact'
        forces the XLA dense kernel; 'hybrid[:R]' scans a bf16 twin slab
        with the fused kernel keeping top-R and reranks those rows off the
        fp32 slab with HIGHEST — matches the fp32 scan with high
        probability at near-bf16 scan cost (+50% slab memory; dense
        bf16-rounding near-ties past rank R are unrecoverable — see
        index/flat._hybrid_search_fn)."""
        if scan_mode not in ("auto", "dense", "probe"):
            raise ValueError(f"scan_mode must be auto|dense|probe, got {scan_mode!r}")
        if selection.partition(":")[0] not in ("auto", "pallas", "exact", "hybrid"):
            raise ValueError(
                f"selection must be auto|pallas|exact|hybrid[:R], got {selection!r}"
            )
        if selection.partition(":")[0] == "hybrid" and compute_dtype is not None:
            raise ValueError("selection='hybrid' reranks in fp32; "
                             "compute_dtype must stay None (fp32)")
        self.dim = int(dim)
        self.metric = Metric.parse(metric)
        self.nlist = int(nlist)
        self.nprobe = int(nprobe)
        self.compute_dtype = compute_dtype
        self.seed = seed
        self.train_dtype = train_dtype
        self.scan_mode = scan_mode
        self.train_init = train_init
        self.selection = selection

        self._buffer = FlatIndex(dim, self.metric, compute_dtype=compute_dtype)
        # built main slab (host truth). The permuted host slab and the
        # id->row dict are materialized LAZILY from (_xbase, _order): at 1M
        # rows the permute alone costs ~15-40 s in first-touch page faults
        # (see ops/transfer.py) and pure-serving builds never need either —
        # only snapshot/scan/rebuild/mutation paths do.
        self._built = False
        self._centroids: Optional[np.ndarray] = None   # [K, D]
        self._xperm_cache: Optional[np.ndarray] = np.zeros((0, self.dim), np.float32)
        self._xbase: Optional[np.ndarray] = None       # unpermuted merged corpus
        self._order: Optional[np.ndarray] = None       # argsort(assign)
        self._main_n = 0
        self._perm_ids: list[str] = []
        self._main_pos_cache: Optional[dict[str, int]] = {}
        self._alive = np.zeros(0, bool)
        self._offsets = np.zeros(0, np.int32)
        self._lens = np.zeros(0, np.int32)
        self._main_live = 0
        self._dirty = True
        self._dev: Optional[dict] = None

    @property
    def _xperm(self) -> np.ndarray:
        """Permuted host slab (cluster-major). Materialized on first use."""
        cache = self._xperm_cache
        if cache is None:
            with self.lock:
                if self._xperm_cache is None:
                    self._xperm_cache = self._xbase[self._order]
                    self._xbase = None
                    self._order = None
                cache = self._xperm_cache
        return cache

    @_xperm.setter
    def _xperm(self, value: np.ndarray) -> None:
        self._xperm_cache = value
        self._xbase = None
        self._order = None
        self._main_n = value.shape[0]

    @property
    def _main_pos(self) -> dict[str, int]:
        """id -> permuted-row dict. Materialized on first mutation/lookup."""
        cache = self._main_pos_cache
        if cache is None:
            with self.lock:
                if self._main_pos_cache is None:
                    self._main_pos_cache = {
                        pid: r for r, pid in enumerate(self._perm_ids)
                    }
                cache = self._main_pos_cache
        return cache

    @_main_pos.setter
    def _main_pos(self, value: dict[str, int]) -> None:
        self._main_pos_cache = value

    # ---- mutation -------------------------------------------------------

    def add(self, id: str, vector: np.ndarray) -> bool:
        with self.lock:
            row = self._main_pos.get(id)
            if row is not None and self._alive[row]:
                return False
            return self._buffer.add(id, vector)

    def upsert(self, id: str, vector: np.ndarray) -> None:
        with self.lock:
            row = self._main_pos.get(id)
            if row is not None and self._alive[row]:
                self._alive[row] = False  # main copy superseded by buffer copy
                self._main_live -= 1
                self._dirty = True
            self._buffer.upsert(id, vector)

    def delete(self, id: str) -> bool:
        with self.lock:
            if self._buffer.delete(id):
                return True
            row = self._main_pos.get(id)
            if row is None or not self._alive[row]:
                return False
            self._alive[row] = False
            self._main_live -= 1
            self._dirty = True
            return True

    def add_batch(self, ids, vectors) -> int:
        if not self._built and not self._main_pos:
            return self._buffer.add_batch(ids, vectors)
        return super().add_batch(ids, vectors)

    # ---- build ----------------------------------------------------------

    def build(self) -> None:
        """Merge main + buffer, retrain k-means, re-bucket
        (ref: IvfFlatVectorIndex.cs:85-145)."""
        with self.lock:
            self._build_locked()

    def _build_locked(self) -> None:
        ids: list[str] = []
        rows: list[np.ndarray] = []
        main_live_rows = [r for r in range(len(self._perm_ids)) if self._alive[r]]
        if main_live_rows:
            ids.extend(self._perm_ids[r] for r in main_live_rows)
            rows.append(self._xperm[main_live_rows])
        bids, bvecs = self._buffer.live_vectors()
        if bids:
            ids.extend(bids)
            rows.append(bvecs)
        if not ids:
            return
        x = np.concatenate(rows) if len(rows) > 1 else rows[0]
        n = x.shape[0]
        k = min(self.nlist, n)

        # single corpus upload: train + assign reuse one device buffer, and
        # the search slab below is a device-side take of the same buffer
        # (the tunnel upload dominates build time — see ops/kmeans.py)
        cents, assign, x_dev = kmeans_build(
            x, k, self.metric, seed=self.seed, compute_dtype=self.train_dtype,
            init=self.train_init,
        )

        order = np.argsort(assign, kind="stable")
        # defer the host permute + id->row dict: serving needs neither
        self._xperm_cache = None
        self._xbase = x
        self._order = order
        self._main_n = n
        self._perm_ids = [ids[i] for i in order]
        self._main_pos_cache = None
        self._alive = np.ones(n, bool)
        self._lens = np.bincount(assign, minlength=k).astype(np.int32)
        self._offsets = np.concatenate([[0], np.cumsum(self._lens)[:-1]]).astype(np.int32)
        self._centroids = cents[:k]
        self._main_live = n
        self._built = True
        self._buffer = FlatIndex(self.dim, self.metric, compute_dtype=self.compute_dtype)
        self._install_device_slab(x_dev, order)

    def get_centroids(self) -> Optional[np.ndarray]:
        return None if self._centroids is None else self._centroids.copy()

    # ---- query ----------------------------------------------------------

    def _sync(self) -> dict:
        if self._dev is not None and not self._dirty:
            return self._dev
        with self.lock:
            return self._sync_locked()

    def _host_tables(self) -> dict:
        """Padded centroid/list/alive tables shared by the host-upload sync
        and the device-side build install."""
        k = self._lens.shape[0]
        kpad = round_up(max(k, 1), 8)
        l_pad = int(round_up(max(int(self._lens.max()) if k else 1, 1), 128))
        n = self._main_n
        npad = slab_pad(n, l_pad)
        alive = np.zeros(npad, bool)
        alive[:n] = self._alive
        cents = np.zeros((kpad, self.dim), np.float32)
        cvalid = np.zeros(kpad, bool)
        if self._centroids is not None:
            cents[:k] = self._centroids
            cvalid[:k] = True
        offs = np.zeros(kpad, np.int32)
        lens = np.zeros(kpad, np.int32)
        offs[:k] = self._offsets
        lens[:k] = self._lens
        # static dense-mask tables: row -> cluster id, row -> within-list
        # position (pad rows point at a masked-off slot; alive=False anyway)
        crow = np.full(npad, kpad - 1, np.int32)
        pos = np.zeros(npad, np.int32)
        if n:
            crow[:n] = np.repeat(np.arange(k, dtype=np.int32), self._lens)
            pos[:n] = np.arange(n, dtype=np.int32) - self._offsets[crow[:n]]
        # windowed-Pallas eligibility for wide cluster tables: per-tile
        # cluster bands of the cluster-major slab (see ops/pallas_scan)
        tile_clo, win_ok = None, False
        from pyrope_tpu.ops.pallas_scan import (
            PALLAS_IVF_MAX_KPAD,
            padded_probe_width,
            pick_row_tile,
            tile_cluster_windows,
        )

        if kpad > PALLAS_IVF_MAX_KPAD:  # narrow tables use the plain kernel
            # fp32-based dim-aware tile: the SAME pick the dense-Pallas fns
            # make at call time (the tile_clo grid must match the kernel's)
            tile_clo, win_ok = tile_cluster_windows(
                crow, n, npad, pick_row_tile(npad, self.dim, "float32"),
                padded_probe_width(kpad),
            )
        return {
            "k": k, "kpad": kpad, "l_pad": l_pad, "n": n, "npad": npad,
            "alive": alive, "cents": cents, "cvalid": cvalid,
            "offs": offs, "lens": lens, "crow": crow, "pos": pos,
            "tile_clo": tile_clo, "win_ok": win_ok,
        }

    def _dev_common(self, t: dict) -> dict:
        return {
            "cents": jnp.asarray(t["cents"]),
            "cvalid": jnp.asarray(t["cvalid"]),
            "alive": jnp.asarray(t["alive"]),
            "offsets": jnp.asarray(t["offs"]),
            "lens": jnp.asarray(t["lens"]),
            "crow": jnp.asarray(t["crow"]),
            "pos": jnp.asarray(t["pos"]),
            "tile_clo": (jnp.asarray(t["tile_clo"])
                         if t.get("tile_clo") is not None else None),
            "win_ok": t.get("win_ok", False),
            "l_pad": t["l_pad"],
            "k_actual": t["k"],
            # row->id table CONSISTENT with this slab: build()/load() replace
            # self._perm_ids with a fresh list, so a search that captured an
            # older dev dict still resolves against the matching table
            # (a concurrent rebuild otherwise crashes or mislabels hits)
            "perm_ids": self._perm_ids,
        }

    def _install_device_slab(self, x_dev: jax.Array, order: np.ndarray) -> None:
        """Build the device search slab from the already-uploaded corpus
        buffer via a device-side permuted take — no slab re-upload."""
        from pyrope_tpu.ops.slab import pad_order, take_slab

        t = self._host_tables()
        xperm, sqnorm = take_slab(x_dev, pad_order(order, t["npad"], x_dev.shape[0]))
        self._dev = {"xperm": xperm, "sqnorm": sqnorm, **self._dev_common(t)}
        if self.selection.partition(":")[0] == "hybrid":
            self._dev["xperm16"] = _cast_bf16(xperm)  # device-side, no re-upload
        self._dirty = False

    def _sync_locked(self) -> dict:
        if self._dev is not None and not self._dirty:
            return self._dev
        t = self._host_tables()
        n, npad = t["n"], t["npad"]
        xp = self._xperm
        sq = np.zeros(npad, np.float32)
        sq[:n] = np.einsum("nd,nd->n", xp, xp)
        self._dev = {
            "xperm": upload_rows(xp, pad_to=npad),
            "sqnorm": jnp.asarray(sq),
            **self._dev_common(t),
        }
        if self.selection.partition(":")[0] == "hybrid":
            self._dev["xperm16"] = _cast_bf16(self._dev["xperm"])
        self._dirty = False
        return self._dev

    def device_search(
        self, q: jax.Array, top_k: int,
        options: SearchOptions = DEFAULT_SEARCH_OPTIONS,
    ) -> tuple[jax.Array, jax.Array]:
        """Device-resident query over the built main slab only (the mutable
        buffer must be empty — compact first). Returns device
        (scores [B, k], permuted rows [B, k]); no host sync."""
        if self._buffer.get_stats().count:
            raise RuntimeError("device_search requires an empty buffer; call build()")
        if not self._built:
            raise RuntimeError("device_search requires a built index")
        dev = self._sync()
        nprobe = min(options.nprobe or self.nprobe, dev["k_actual"])
        ms = options.max_scans if options.max_scans is not None else self._main_n
        return self._run_scan(dev, q, top_k, nprobe, ms)

    def _resolve_scan(self, dev: dict, batch: int, nprobe: int, ms: int) -> str:
        """Resolve (batch, nprobe, max_scans) to the kernel that will run:
        'probe', 'dense-xla', 'dense-pallas', or 'dense-pallas-win'. The
        SINGLE source of routing truth, shared by _run_scan (dispatch) and
        describe_scan (bench labeling) so a recorded scan_path is always the
        kernel actually measured."""
        from pyrope_tpu.ops.pallas_scan import PALLAS_IVF_MAX_KPAD

        p_ok = pallas_dense_ok(
            self.selection, self.metric, self.compute_dtype,
            dev["xperm"].shape[0], dev["cents"].shape[0], batch,
            ms, self._main_n, win_ok=dev.get("win_ok", False), dim=self.dim,
        )
        mode = pick_scan_mode(
            self.scan_mode, dev["xperm"].shape[0], nprobe, dev["l_pad"],
            batch=batch, pallas_ok=p_ok,
        )
        if mode != "dense":
            return "probe"
        if not p_ok:
            return "dense-xla"
        path = ("dense-pallas-win"
                if dev["cents"].shape[0] > PALLAS_IVF_MAX_KPAD
                else "dense-pallas")
        if (self.selection.partition(":")[0] == "hybrid"
                and batch <= HYBRID_MAX_BATCH):
            # ineligible shapes / max_scans budgets above fell back to the
            # XLA kernels, which are already exact fp32 — 'hybrid' only
            # swaps in the bf16-shortlist kernel (exact w.h.p.). Batches
            # above the crossover keep the fp32 dense kernel: the R-wide
            # bitonic merge across many batch groups costs more than the
            # fp32 slab's extra passes (see index/flat.py HYBRID_MAX_BATCH)
            path += "-hybrid"
        return path

    def _run_scan(self, dev: dict, q: jax.Array, top_k: int, nprobe: int, ms: int):
        path = self._resolve_scan(dev, q.shape[0], nprobe, ms)
        if (self.selection == "pallas" and ms >= self._main_n
                and path in ("probe", "dense-xla")):
            # a per-query max_scans budget (ms < n, e.g. SLO degradation)
            # falls back to the XLA kernels silently; anything else under
            # explicit 'pallas' — including a probe-mode resolution — is a
            # config error, never a silent kernel swap
            raise ValueError(
                "selection='pallas' requires the fused dense kernel but the "
                f"scan resolved to {path!r} (needs dense mode, L2/IP, fp32 "
                "compute, tile-divisible shapes)"
            )
        if path in ("dense-pallas-hybrid", "dense-pallas-win-hybrid"):
            from pyrope_tpu.index.flat import hybrid_shortlist
            from pyrope_tpu.ops.pallas_scan import pick_row_tile
            from pyrope_tpu.ops.topk import parse_selection

            # Clamp R to the SAME row tile the hybrid kernel will pick
            # (pick_row_tile shrinks below 4096 for dim > 256): an R wider
            # than the actual tile disqualifies the bitonic merge inside
            # _wide_params and silently drops to the O(R*(R+T)) extract-max
            # fallback — a perf cliff on exactly the path built for speed.
            r = hybrid_shortlist(
                top_k, parse_selection(self.selection)[1],
                pick_row_tile(dev["xperm"].shape[0], self.dim, "float32"),
            )
            windowed = path == "dense-pallas-win-hybrid"
            fn = _ivf_dense_pallas_hybrid_fn(self.metric, top_k, r, nprobe,
                                             windowed=windowed)
            return fn(
                dev["cents"], dev["cvalid"], dev["xperm"], dev["xperm16"],
                dev["sqnorm"], dev["alive"], dev["offsets"], dev["lens"],
                dev["crow"], dev.get("tile_clo"), q, device_i32(ms),
            )
        if path == "dense-pallas-win":
            fn = _ivf_dense_pallas_win_fn(self.metric, top_k, nprobe)
            return fn(
                dev["cents"], dev["cvalid"], dev["xperm"], dev["sqnorm"],
                dev["alive"], dev["offsets"], dev["lens"], dev["crow"],
                dev["tile_clo"], q, device_i32(ms),
            )
        if path == "dense-pallas":
            fn = _ivf_dense_pallas_fn(self.metric, top_k, nprobe)
            return fn(
                dev["cents"], dev["cvalid"], dev["xperm"], dev["sqnorm"],
                dev["alive"], dev["offsets"], dev["lens"], dev["crow"],
                q, device_i32(ms),
            )
        if path == "dense-xla":
            fn = _ivf_dense_fn(self.metric, top_k, nprobe, self.compute_dtype)
            return fn(
                dev["cents"], dev["cvalid"], dev["xperm"], dev["sqnorm"],
                dev["alive"], dev["offsets"], dev["lens"], dev["crow"],
                dev["pos"], q, device_i32(ms),
            )
        fn = _ivf_search_fn(self.metric, top_k, nprobe, dev["l_pad"], self.compute_dtype)
        return fn(
            dev["cents"], dev["cvalid"], dev["xperm"], dev["sqnorm"], dev["alive"],
            dev["offsets"], dev["lens"], q, device_i32(ms),
        )

    def describe_scan(self, batch: int, nprobe: Optional[int] = None,
                      max_scans: Optional[int] = None) -> str:
        """Which kernel a (batch, nprobe, max_scans) query would run:
        'probe', 'dense-xla', 'dense-pallas', or 'dense-pallas-win'
        (max_scans None = full scan). Benchmark rows record this so a QPS
        number is never quoted without its code path."""
        if not self._built:
            return "buffer"
        dev = self._sync()
        np_eff = min(nprobe or self.nprobe, dev["k_actual"])
        ms = max_scans if max_scans is not None else self._main_n
        return self._resolve_scan(dev, batch, np_eff, ms)

    def resolve_rows(self, rows: np.ndarray) -> list[list[str]]:
        return [
            [self._perm_ids[int(r)] if r >= 0 else "" for r in row]
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

        # exact scan of the mutable buffer (ref :170-180)
        buf_hits = (
            self._buffer.search_batch(q, top_k, options)
            if self._buffer.get_stats().count
            else [[] for _ in range(b)]
        )
        if not self._built or self._main_live == 0:
            return buf_hits

        dev = self._sync()
        nprobe = min(options.nprobe or self.nprobe, dev["k_actual"])
        ms = options.max_scans if options.max_scans is not None else self._main_n
        bb = batch_bucket(b)
        qp = np.pad(q, ((0, bb - b), (0, 0))) if bb != b else q
        vals, rows = self._run_scan(dev, jnp.asarray(qp), top_k, nprobe, ms)
        vals = np.asarray(vals)[:b]
        rows = np.asarray(rows)[:b]

        perm_ids = dev["perm_ids"]
        out: list[list[SearchResult]] = []
        for bi in range(b):
            hits = list(buf_hits[bi])
            for v, r in zip(vals[bi], rows[bi]):
                if r < 0 or not np.isfinite(v):
                    continue
                hits.append(SearchResult(perm_ids[int(r)], float(v)))
            hits.sort(key=lambda h: -h.score)
            out.append(hits[:top_k])
        return out

    # ---- lifecycle ------------------------------------------------------

    def scan(self) -> Iterator[tuple[str, np.ndarray]]:
        for r, pid in enumerate(self._perm_ids):
            if self._alive[r]:
                yield pid, self._xperm[r].copy()
        yield from self._buffer.scan()

    def get_stats(self) -> IndexStats:
        return IndexStats(
            count=self._main_live + self._buffer.get_stats().count,
            dim=self.dim,
            metric=self.metric,
        )

    def snapshot(self, path: str) -> None:
        """Full-state snapshot: centroids + permuted slab + lists + buffer
        (ref: IvfFlatVectorIndex.cs:233-298 JSON snapshot — here one npz).

        Runs under the index lock: live_vectors may return a VIEW of the
        buffer slab and a concurrent upsert writes rows in place."""
        with self.lock:
            self._snapshot_locked(path)

    def _snapshot_locked(self, path: str) -> None:
        bids, bvecs = self._buffer.live_vectors()
        meta = json.dumps({
            "format": "pyrope_tpu.ivf_flat.v1",
            "dim": self.dim,
            "metric": self.metric.value,
            "nlist": self.nlist,
            "nprobe": self.nprobe,
            "built": self._built,
            "seed": self.seed,
            "scan_mode": self.scan_mode,
        })
        np.savez_compressed(
            path,
            meta=np.str_(meta),
            centroids=self._centroids if self._centroids is not None else np.zeros((0, self.dim), np.float32),
            xperm=self._xperm,
            perm_ids=np.array(self._perm_ids, dtype=np.str_),
            alive=self._alive,
            offsets=self._offsets,
            lens=self._lens,
            buf_ids=np.array(bids, dtype=np.str_),
            buf_vecs=bvecs,
        )

    def load(self, path: str) -> None:
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
            if meta.get("format") != "pyrope_tpu.ivf_flat.v1":
                raise ValueError(f"bad snapshot format: {meta.get('format')}")
            if int(meta["dim"]) != self.dim:
                raise ValueError("snapshot dim mismatch")
            self.metric = Metric.parse(meta["metric"])
            self.nlist = int(meta["nlist"])
            self.nprobe = int(meta["nprobe"])
            self.seed = int(meta.get("seed", 42))
            self.scan_mode = str(meta.get("scan_mode", self.scan_mode))
            self._built = bool(meta["built"])
            cents = np.asarray(z["centroids"], np.float32)
            self._centroids = cents if cents.size else None
            self._xperm = np.asarray(z["xperm"], np.float32)
            self._perm_ids = [str(s) for s in z["perm_ids"]]
            self._alive = np.asarray(z["alive"], bool)
            self._offsets = np.asarray(z["offsets"], np.int32)
            self._lens = np.asarray(z["lens"], np.int32)
            self._main_pos = {pid: r for r, pid in enumerate(self._perm_ids)}
            self._main_live = int(self._alive.sum())
            self._buffer = FlatIndex(self.dim, self.metric, compute_dtype=self.compute_dtype)
            bids = [str(s) for s in z["buf_ids"]]
            if bids:
                self._buffer.add_batch(bids, np.asarray(z["buf_vecs"], np.float32))
        self._dirty = True
        self._dev = None
