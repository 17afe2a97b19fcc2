"""Pallas TPU kernel: fused flat scan + running top-k.

The XLA path (ops/distance.score_matrix + lax.top_k / approx_max_k)
materializes the [B, N] score matrix in HBM before selecting. This kernel
never does: corpus tiles stream HBM→VMEM through the Pallas pipeline
(double-buffered automatically by the grid), each tile is scored on the MXU
(`pl.dot`), and a [B, k] running top-k lives in VMEM scratch across grid
steps — the SURVEY §7 "fused running top-k inside the scan kernel" design.
Per-batch HBM traffic is exactly one slab read.

Selection inside the kernel is k rounds of (max, argmax, mask-out) over the
[B, k + TILE] candidate row — pure VPU work on a fused buffer, ~k·(k+TILE)
ops per tile vs. a full sort.

Grid: (batch tiles, corpus tiles); the corpus axis iterates fastest, so the
scratch accumulator resets at n_idx == 0 and flushes to the output block at
the last corpus tile (TPU grid steps run sequentially per core).

Semantics match ops/topk.masked_topk(..., selection="exact"): masked rows
(dead or >= max_scans) score -inf, missing hits report index -1, and scores
follow the engine convention (L2 -> -d², IP -> dot; cosine callers
pre-normalize rows and use IP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyrope_tpu.types import Metric

# 4096-row tiles amortize the merge's lane reductions: measured on v5e at
# 1M x 128 the kernel runs 2.66 ms vs 5.55 ms with 1024-row tiles (and vs
# 4.05 ms for XLA score+top_k) — exact, overlap 1.0
DEFAULT_ROW_TILE = 4096
DEFAULT_BATCH_TILE = 64
# The [row_tile, D] corpus tile is the dominant scoped-vmem term (the Pallas
# pipeline double-buffers it). Cap a single buffer at 4 MB so the pair plus
# the [Bt, T] score/merge temporaries stay inside the 16 MB scoped-vmem
# stack: d=768 fp32 at row_tile 4096 measured a 24.65 MB AOT OOM on v5e
# (two 12.6 MB x-tile buffers); d=128 keeps the full 4096 tile.
X_TILE_BUDGET_BYTES = 4 * 1024 * 1024


def pick_row_tile(n: int, d: int, dtype="float32",
                  cap: int = DEFAULT_ROW_TILE) -> int:
    """Largest power-of-two row tile <= cap whose [row_tile, d] corpus tile
    fits ``X_TILE_BUDGET_BYTES`` (floor 256), clamped to n. Callers that
    share one tile_clo table across fp32/bf16 slabs (the windowed IVF
    kernels) must pass the WIDEST dtype so every kernel sees the same grid
    as the table."""
    itemsize = jnp.dtype(dtype).itemsize
    rt = cap
    while rt > 256 and rt * d * itemsize > X_TILE_BUDGET_BYTES:
        rt //= 2
    return min(rt, n)
NEG_INF = -3.4e38  # finite sentinel (python float: jnp scalars cannot be captured by kernels)
RANK_MERGE_MAX_K = 32  # above this, _merge_tile uses the full extract-max merge
import os as _os

# dynamic-rounds extraction inside the wide-k bitonic merge (bisect flag)
WIDE_DYN_EXTRACT = _os.environ.get("PYROPE_WIDE_DYN_EXTRACT", "1") == "1"


def _beats(va, ia, vb, ib):
    """Total-order comparator: (va, ia) strictly precedes (vb, ib) in the
    (value desc, row asc) order every selection path shares — equal scores
    prefer the lower corpus row, matching lax.top_k and the narrow merge's
    first-column argmax, so all kernels return identical hit sets."""
    return (va > vb) | ((va == vb) & (ia < ib))


def _lane_roll(x, s: int):
    """Lane-dim rotate. On real TPUs this MUST be pltpu.roll (lowers to one
    tpu.DynamicRotate): jnp.roll's concatenate-of-slices lowering SIGABRTs
    the Mosaic LoweringEmitter (`limits[i] <= dim(i) (8 vs. 1)`) when the
    rotated value feeds the compare/select chains of the bitonic network
    (bisected on v5e; a lone jnp.roll compiles fine). Interpret mode
    (CPU tests) keeps jnp.roll — pltpu.roll has no interpret rule."""
    if jax.default_backend() in ("tpu", "axon"):
        # roll_p matches jnp.roll semantics but requires shift >= 0
        return pltpu.roll(x, s % x.shape[-1], axis=x.ndim - 1)
    return jnp.roll(x, s, axis=-1)


def _cmpex(v, i, s: int, dirm):
    """One bitonic compare-exchange stage at XOR-stride ``s`` over the lane
    dim. ``dirm`` bool [.., T]: True where the enclosing block sorts
    descending. Partners are fetched with two static rotates (XOR partners
    sit at ±s; each lane keeps the correct one), so the stage is pure
    vreg work — no gathers."""
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    low = (col & s) == 0
    pv = jnp.where(low, _lane_roll(v, -s), _lane_roll(v, s))
    pi = jnp.where(low, _lane_roll(i, -s), _lane_roll(i, s))
    keep_max = low == dirm
    take_self = _beats(v, i, pv, pi) == keep_max
    return jnp.where(take_self, v, pv), jnp.where(take_self, i, pi)


def _bitonic_tile_topk(scores, base, kpad: int):
    """Sorted-desc top-``kpad`` of each row of ``scores`` [Bt, T] via a
    bitonic partial sort (T, kpad powers of two; kpad <= T).

    1. Sort every kpad-block: the standard alternating bitonic network at
       intermediate levels; the final level sorts the tile's first half of
       blocks descending and second half ascending (the reduction's
       invariant).
    2. Reduction rounds: the first and second halves pair elementwise as
       (desc, asc) = bitonic, so one compare keeps the top-kpad multiset of
       every pair (Batcher's bitonic halver), then log2(kpad) merge stages
       restore per-block order. Width halves every round until one sorted
       block remains — O(T·log²(kpad)) VPU work vs the extract-max loop's
       O(k·(k+T)) (3.4k QPS at k=100 on 1M, VERDICT r3 #2)."""
    bt, t = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bt, t), 1)
    return _bitonic_sort_pairs(scores, base + col, kpad)


def _bitonic_sort_pairs(v, i, kpad: int):
    """Sorted-desc top-``kpad`` of (value, index) pairs [Bt, t] — the
    bitonic network of ``_bitonic_tile_topk`` with EXPLICIT indices (the
    chunked merge extracts per-chunk argmax columns, so candidate indices
    are not contiguous). t, kpad powers of two; kpad <= t."""
    bt, t = v.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bt, t), 1)
    size = 2
    while size <= kpad:
        if size < kpad:
            dirm = (col & size) == 0
        else:
            dirm = col < max(t // 2, kpad)
        s = size // 2
        while s >= 1:
            v, i = _cmpex(v, i, s, dirm)
            s //= 2
        size *= 2
    w = t
    while w > kpad:
        h = w // 2
        av, ai = v[:, :h], i[:, :h]
        bv, bi = v[:, h:], i[:, h:]
        mine = _beats(av, ai, bv, bi)
        v = jnp.where(mine, av, bv)
        i = jnp.where(mine, ai, bi)
        w = h
        colw = jax.lax.broadcasted_iota(jnp.int32, (bt, w), 1)
        dirm = colw < max(w // 2, kpad)
        s = kpad // 2
        while s >= 1:
            v, i = _cmpex(v, i, s, dirm)
            s //= 2
    return v, i


def _reverse_lanes(v, i, width: int):
    """Reverse [Bt, width] on the lane dim (width a power of two) by
    swapping each index bit — log2(width) roll+select stages, no gathers."""
    s = width // 2
    while s >= 1:
        col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        low = (col & s) == 0
        v = jnp.where(low, _lane_roll(v, -s), _lane_roll(v, s))
        i = jnp.where(low, _lane_roll(i, -s), _lane_roll(i, s))
        s //= 2
    return v, i


def _bitonic_list_merge(run_v, run_i, ext_v, ext_i, kpad: int):
    """Merge a sorted-desc [Bt, kpad] extract list into the sorted-desc
    running scratch: reverse the extract (desc+asc concat = bitonic), one
    elementwise halver compare keeps the top-kpad multiset, then a
    log2(kpad)-stage descending bitonic merge restores order."""
    ext_v, ext_i = _reverse_lanes(ext_v, ext_i, kpad)
    rv, ri = run_v[:], run_i[:]
    mine = _beats(rv, ri, ext_v, ext_i)
    v = jnp.where(mine, rv, ext_v)
    i = jnp.where(mine, ri, ext_i)
    dirm = jnp.ones(v.shape, bool)
    s = kpad // 2
    while s >= 1:
        v, i = _cmpex(v, i, s, dirm)
        s //= 2
    run_v[:] = v
    run_i[:] = i


def _bitonic_merge_wide(run_v, run_i, scores, base, *, k: int, kpad: int):
    """Wide-k tile merge for candidate-DENSE tiles: bitonic tile top-kpad
    (O(T·log²(kpad)) regardless of how many candidates there are), then the
    sorted-list merge."""
    ext_v, ext_i = _bitonic_tile_topk(scores, base, kpad)
    _bitonic_list_merge(run_v, run_i, ext_v, ext_i, kpad)


def _merge_tile_wide(run_v, run_i, scores, base, *, k: int):
    """k rounds of extract-max over the fused [Bt, k + T] candidate row.

    The FALLBACK wide-k merge (non-power-of-two row tiles where the
    bitonic network above does not apply): O(k·(k+T)) VPU work per merging
    tile, but constant vmem — no unrolled [Bt, k] temporaries (the rank
    merge's 2k unrolled where-chains blow the 16 MB scoped-vmem stack at
    k ~ 100; measured 21.5 MB)."""
    bt, t = scores.shape
    rows = base + jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    cand_v = jnp.concatenate([run_v[:], scores], axis=1)
    cand_i = jnp.concatenate(
        [run_i[:], jnp.broadcast_to(rows, scores.shape)], axis=1
    )
    width = cand_v.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (bt, width), 1)
    new_v = []
    new_i = []
    for _ in range(k):
        m = jnp.max(cand_v, axis=1, keepdims=True)            # [Bt, 1]
        is_m = cand_v == m
        # first column attaining the max
        first = jnp.min(jnp.where(is_m, col, width), axis=1, keepdims=True)
        picked = col == first
        sel_i = jnp.sum(jnp.where(picked, cand_i, 0), axis=1, keepdims=True)
        new_v.append(m)
        new_i.append(jnp.where(m > NEG_INF, sel_i, -1))
        cand_v = jnp.where(picked, NEG_INF, cand_v)
    run_v[:] = jnp.concatenate(new_v, axis=1)
    run_i[:] = jnp.concatenate(new_i, axis=1)


def _tile_scores(q, x, sq, *, metric: Metric, promote_fp32: bool = False,
                 demote_bf16: bool = False):
    """Score one corpus tile on the MXU: q [Bt, D], x [T, D] -> [Bt, T].

    ``demote_bf16``: cast BOTH operands to bf16 and run a single MXU pass
    (fp32 accumulate) even off an fp32 slab — the scan half of the hybrid
    exact path (bf16 scan keeps top-R, fp32-HIGHEST rerank restores
    exactness; VERDICT r3 #1: the fp32-HIGHEST full scan pays ~1.8x for
    exactness the rerank gets from R rows)."""
    if demote_bf16:
        return _tile_scores(q.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                            sq, metric=metric)
    # fp32 operands MUST pin HIGHEST: the MXU's default fp32 matmul runs
    # bf16 passes, which silently demoted the "exact" fp32 config to bf16
    # scores (measured recall 0.9828 instead of 1.0). bf16 slabs keep the
    # fast default unless promote_fp32 asks for the exact-rerank convention
    # (operands promoted to fp32, HIGHEST — storage rounding is then the
    # only inexactness, matching ops/distance.rerank_exact).
    if promote_fp32:
        x = x.astype(jnp.float32)
    prec = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    dots = jax.lax.dot_general(
        q.astype(x.dtype), x,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )                                              # [Bt, T] fp32 accumulate
    if metric == Metric.L2:
        qq = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return -jnp.maximum(qq - 2.0 * dots + sq[None, :], 0.0)
    return dots  # IP (cosine rows pre-normalized)


MERGE_CHUNK = 128  # lane-chunk width of the multi-extraction merge

# The scan kernels' scratch + temporaries brush the 16 MB default scoped-
# vmem stack (the chunked merge's [Bt, nch, 128] loop state measured
# 16.56 MB at Bt=128/T=4096; wide-k at Bt=128 measured 17-21 MB). v5e VMEM
# is 128 MB and these kernels' pipeline buffers are ~10 MB, so a 40 MB
# scoped stack is safe headroom. vmem_limit_bytes rides the custom call's
# scoped_memory_configs; do NOT pass the xla_tpu_scoped_vmem_limit_kib
# flag_configs entry — this libtpu's llo_region flag parser SIGABRTs on it
# ("HLO backend flag value is not one of boolean, integer or double",
# 2026-08-20).
_SCOPED_VMEM_BYTES = 40 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=_SCOPED_VMEM_BYTES,
)

# narrow-k merge strategy: "extract" (default) = the extract-max +
# rank-merge path; "chunk" = per-chunk multi-extraction (below) — a
# MEASURED DEAD END on hardware (2026-08-20 same-day A/B: 286.6 vs
# 14.6 ms on 1M b1024, identical hit rows): its [Bt, nch, 128] loop state
# lowers to degenerate Mosaic layouts (relayout per op). Kept for the
# record + interpret-mode coverage. Module global (not a frozen env read)
# so A/B probes can flip it; the _build* lru_caches do NOT key on it —
# call .cache_clear() after flipping.
NARROW_MERGE = _os.environ.get("PYROPE_NARROW_MERGE", "extract")


def _merge_tile_chunked(run_v, run_i, scores, base, *, k: int):
    """Narrow-k merge by per-chunk multi-extraction (VERDICT r4 #1).

    The r3 extract-max path pays ~4 full-[Bt, T] passes PER EXTRACTED
    ENTRY, and its dynamic round count is the max over the whole batch
    tile — at b1024 the 128-query union makes nearly every tile merge and
    the cold-start tiles pay k full rounds (measured: merge = 9.7 ms of
    the 15.98 ms 1M b1024 kernel; scan floor 4.05 ms). Here one round
    extracts the maxima of ALL t/128 lane-chunks at once:

      1. cm[b, c] = max of chunk c (one reduce pass)
      2. per-chunk argmax column (compare + min-reduce)
      3. bitonic-sort the (cm, idx) candidates, keep top-kpad, one
         sorted-list merge into the running scratch ([Bt, nch]-sized
         vreg work — 1/128th of a tile pass)
      4. column-mask the extracted entries (one pass)

    so a round surfaces up to nch entries for ~4 tile passes, and the
    EXACT round count is max over (query, chunk) of entries-beating-theta
    per SINGLE chunk — ~1-2 on long scans (vs the per-TILE count the
    extract path pays; only the cold first tile still needs up to k).
    Scratch is kpad = next_pow2(k) wide and kept sorted desc (the wide-k
    bitonic invariants; same flush contract).

    Correctness: entries masked after a merge lost to the post-merge
    kpad-th bound, which is monotone — they can never re-enter (same
    argument as the extract-path gate). A chunk holding c entries above
    the pre-merge theta surfaces one of them per round (its running max
    beats theta until all c are out), so ``rounds = max per-chunk count``
    extracts every possible contender exactly."""
    bt, t = scores.shape
    nch = t // MERGE_CHUNK
    kpad = run_v.shape[1]
    theta = run_v[:, k - 1 : k]                              # kth best
    tile_max = jnp.max(scores, axis=1, keepdims=True)
    need_merge = jnp.any(tile_max > theta)

    @pl.when(need_merge)
    def _():
        s3 = scores.reshape(bt, nch, MERGE_CHUNK)
        cnt = jnp.sum((s3 > theta[:, :, None]).astype(jnp.int32), axis=2)
        rounds = jnp.minimum(jnp.max(cnt), k)                # exact trip
        col3 = jax.lax.broadcasted_iota(
            jnp.int32, (bt, nch, MERGE_CHUNK), 2)
        chbase = base + jax.lax.broadcasted_iota(
            jnp.int32, (bt, nch), 1) * MERGE_CHUNK

        def body(_, s3c):
            cm = jnp.max(s3c, axis=2)                        # [Bt, nch]
            first = jnp.min(
                jnp.where(s3c == cm[:, :, None], col3, MERGE_CHUNK), axis=2)
            idx = jnp.where(cm > NEG_INF, chbase + first, -1)
            ev, ei = _bitonic_sort_pairs(cm, idx, kpad)
            _bitonic_list_merge(run_v, run_i, ev, ei, kpad)
            return jnp.where(col3 == first[:, :, None], NEG_INF, s3c)

        jax.lax.fori_loop(0, rounds, body, s3)


def _narrow_params(k: int, row_tile: int) -> tuple[int, str]:
    """(scratch width, merge mode) for k <= RANK_MERGE_MAX_K: the chunked
    multi-extraction needs a power-of-two row tile of >= next_pow2(k)
    128-lane chunks (every capacity-bucketed slab tile qualifies);
    otherwise the extract-max + rank-merge path runs at exactly k slots."""
    from pyrope_tpu.utils.shapes import next_pow2

    kp = next_pow2(max(k, 2))
    nch = row_tile // MERGE_CHUNK
    if (
        NARROW_MERGE == "chunk"
        and row_tile % MERGE_CHUNK == 0
        and (nch & (nch - 1)) == 0
        and nch >= kp
    ):
        return kp, "chunk"
    return k, "extract"


def _wide_params(k: int, row_tile: int) -> tuple[int, bool]:
    """(scratch width, bitonic-eligible) for a kernel's running top-k.

    Wide k (> RANK_MERGE_MAX_K) runs the bitonic merge when the row tile is
    a power of two at least next_pow2(k) wide (every capacity-bucketed slab
    qualifies); the scratch then carries next_pow2(k) slots and the flush
    slices the first k. Otherwise the extract-max fallback runs at exactly
    k slots."""
    if k <= RANK_MERGE_MAX_K:
        return k, False
    from pyrope_tpu.utils.shapes import next_pow2

    kp = next_pow2(k)
    if row_tile >= kp and (row_tile & (row_tile - 1)) == 0:
        return kp, True
    return k, False


def _merge_params(k: int, row_tile: int) -> tuple[int, str]:
    """(scratch width, merge mode) for a kernel's running top-k: narrow k
    routes to the chunked multi-extraction when eligible (see
    ``_narrow_params``), wide k to the bitonic network when the row tile
    allows (``_wide_params``), else the extract-max fallbacks."""
    if k <= RANK_MERGE_MAX_K:
        return _narrow_params(k, row_tile)
    kp, bitonic = _wide_params(k, row_tile)
    return kp, ("bitonic" if bitonic else "extract")


def _merge_tile(run_v, run_i, scores, base, *, k: int, merge: str = "extract"):
    """Merge a tile's masked scores into the [Bt, k] running top-k scratch.
    ``base`` is the tile's first corpus row: every kernel scores contiguous
    rows, so the index of an extracted element is just base + its column —
    no index array or masked-sum select pass anywhere in the merge.

    Cost control (the merge, not the MXU, is the kernel's wall — time was
    linear in k before: 0.79 ms at k=1 vs 2.31 ms at k=10 on 1M x 128 b64):

    1. threshold gate: pay one max round always; touch the tile at all only
       when some row improves on its running kth-best.
    2. extract-then-rank-merge: extract the tile's top entries (sorted
       desc) into a [Bt, k] list, then merge the two sorted k-lists by
       rank arithmetic on [Bt, k] vregs — O(k^2) tiny-vector ops instead
       of k extra passes over the tile (the old fused [Bt, k+T] merge).
    3. dynamic rounds: count per row how many scores beat that row's
       kth-best; when few do (most tiles on long scans), extract with a
       data-dependent `fori_loop` trip of that many rounds. When ~k rounds
       are needed anyway (early tiles, theta still warming), a fully-
       unrolled static extraction wins instead — Mosaic software-pipelines
       the static passes where a dynamic trip serializes them. Same-day
       A/B at k=10 b1024: dynamic-only was 1.79x on 1M x 128 but 11%
       WORSE on the 25-tile 100k dense-IVF scan; the 2*rounds>k branch
       keeps both wins.

    Tie-breaking matches the original fused merge: existing run entries
    win ties against tile scores (rank counts `>=` for run), and within a
    tile the lowest row index wins (first-column argmax)."""
    if merge == "chunk":
        _merge_tile_chunked(run_v, run_i, scores, base, k=k)
        return

    tile_max = jnp.max(scores, axis=1, keepdims=True)         # [Bt, 1]
    theta = run_v[:, k - 1 : k]                               # kth best per row
    need_merge = jnp.any(tile_max > theta)

    if k > RANK_MERGE_MAX_K:
        # scratch may carry next_pow2(k) slots (bitonic); gating on the kth
        # (not kpad-th) best stays correct: a skipped tile's entries could
        # only have landed beyond position k, never inside the final top-k
        @pl.when(need_merge)
        def _():
            if merge == "bitonic":
                kpad = run_v.shape[1]
                if not WIDE_DYN_EXTRACT:
                    _bitonic_merge_wide(run_v, run_i, scores, base, k=k,
                                        kpad=kpad)
                    return
                # dynamic rounds, same trick as the narrow path below: on
                # long scans most tiles hold only a handful of candidates
                # beating theta (E ≈ k/tile_index per row), so extract just
                # those with a data-dependent fori_loop and bitonic-merge
                # the sorted list — the full O(T·log²kpad) tile sort runs
                # only on candidate-dense tiles (theta still warming).
                # Under-extraction vs the kpad scratch is safe: an entry
                # <= theta ranks after >= k tracked entries, so it can
                # never enter the final top-k (same argument as the gate).
                beats = jnp.sum(
                    jnp.where(scores > theta, 1, 0).astype(jnp.int32), axis=1
                )
                rounds = jnp.minimum(jnp.max(beats), kpad)

                @pl.when(2 * rounds > kpad)
                def _():
                    _bitonic_merge_wide(run_v, run_i, scores, base, k=k,
                                        kpad=kpad)

                @pl.when(2 * rounds <= kpad)
                def _():
                    ev, ei = _extract_top(scores, base, rounds, k=kpad,
                                          unroll=False)
                    _bitonic_list_merge(run_v, run_i, ev, ei, kpad)
            else:
                _merge_tile_wide(run_v, run_i, scores, base, k=k)
        return

    @pl.when(need_merge)
    def _():
        beats = jnp.sum(
            jnp.where(scores > theta, 1, 0).astype(jnp.int32), axis=1
        )                                                     # [Bt]
        rounds = jnp.minimum(jnp.max(beats), k)               # dynamic scalar

        @pl.when(2 * rounds > k)
        def _():
            ext_v, ext_i = _extract_top(scores, base, k, k=k, unroll=True)
            _rank_merge(run_v, run_i, ext_v, ext_i, k=k)

        @pl.when(2 * rounds <= k)
        def _():
            ext_v, ext_i = _extract_top(scores, base, rounds, k=k,
                                        unroll=False)
            _rank_merge(run_v, run_i, ext_v, ext_i, k=k)


def _extract_top(scores, base, n_rounds, *, k: int, unroll: bool):
    """Extract the tile's top entries as sorted-desc [Bt, k] lists.

    Consumes ``scores`` by rounds of (max, first-argmax, mask-out); the
    extracted index is base + first-max column (contiguous rows). The
    DYNAMIC branch skips the last round's mask-out (it feeds nobody; at
    the measured ~1.7 rounds/tile on 1M b1024 that is most rounds —
    same-day A/B 14.64 -> 13.50 ms); the UNROLLED branch keeps the
    uniform k-round body — hoisting its final round out of the static
    loop broke Mosaic's software pipelining on candidate-dense scans
    (ivf100k b4096 16.10 -> 17.21 ms A/B, reverted). ``jnp.argmax`` /
    tpu.reduce_index for the argmax also measured no faster than
    where+min. Slots beyond the extracted prefix stay (NEG_INF, -1)."""
    bt, t = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bt, t), 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (bt, k), 1)

    def extract_one(j, sc, ext_v, ext_i):
        m = jnp.max(sc, axis=1, keepdims=True)                # [Bt, 1]
        # first column attaining the max
        first = jnp.min(jnp.where(sc == m, col, t), axis=1, keepdims=True)
        put = colk == j
        ext_v = jnp.where(put, jnp.broadcast_to(m, (bt, k)), ext_v)
        sel = jnp.where(m > NEG_INF, base + first, -1)
        ext_i = jnp.where(put, jnp.broadcast_to(sel, (bt, k)), ext_i)
        return first, ext_v, ext_i

    def body(j, carry):
        sc, ext_v, ext_i = carry
        first, ext_v, ext_i = extract_one(j, sc, ext_v, ext_i)
        sc = jnp.where(col == first, NEG_INF, sc)
        return sc, ext_v, ext_i

    carry = (
        scores,
        jnp.full((bt, k), jnp.float32(NEG_INF)),
        jnp.full((bt, k), -1, jnp.int32),
    )
    if unroll:
        for j in range(k):
            carry = body(j, carry)
        return carry[1], carry[2]
    carry = jax.lax.fori_loop(0, n_rounds - 1, body, carry)
    _, ext_v, ext_i = extract_one(n_rounds - 1, carry[0], carry[1], carry[2])
    return ext_v, ext_i


def _rank_merge(run_v, run_i, ext_v, ext_i, *, k: int):
    """Merge the sorted-desc [Bt, k] ``ext`` lists into the sorted-desc
    running top-k by rank arithmetic (run wins ties):
    run[i] lands at i + #(ext > run[i]); ext[j] at j + #(run >= ext[j]).
    Both position vectors are strictly increasing, jointly a permutation
    of 0..2k-1; positions >= k simply never match colk."""
    bt = ext_v.shape[0]
    colk = jax.lax.broadcasted_iota(jnp.int32, (bt, k), 1)
    rv, ri = run_v[:], run_i[:]
    cnt_r = jnp.zeros((bt, k), jnp.int32)
    cnt_e = jnp.zeros((bt, k), jnp.int32)
    for jj in range(k):
        cnt_r = cnt_r + (ext_v[:, jj : jj + 1] > rv).astype(jnp.int32)
        cnt_e = cnt_e + (rv[:, jj : jj + 1] >= ext_v).astype(jnp.int32)
    pos_r = colk + cnt_r
    pos_e = colk + cnt_e
    out_v = jnp.full((bt, k), jnp.float32(NEG_INF))
    out_i = jnp.full((bt, k), -1, jnp.int32)
    for jj in range(k):
        put = colk == pos_r[:, jj : jj + 1]
        out_v = jnp.where(put, rv[:, jj : jj + 1], out_v)
        out_i = jnp.where(put, ri[:, jj : jj + 1], out_i)
        put = colk == pos_e[:, jj : jj + 1]
        out_v = jnp.where(put, ext_v[:, jj : jj + 1], out_v)
        out_i = jnp.where(put, ext_i[:, jj : jj + 1], out_i)
    run_v[:] = out_v
    run_i[:] = out_i


def _scan_kernel(ms_ref, q_ref, x_ref, sq_ref, alive_ref, vals_ref, idx_ref,
                 run_v, run_i, *, k: int, metric: Metric, row_tile: int,
                 merge: str):
    n_idx = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(n_idx == 0)
    def _():
        run_v[:] = jnp.full_like(run_v, jnp.float32(NEG_INF))
        run_i[:] = jnp.full_like(run_i, -1)

    scores = _tile_scores(q_ref[:], x_ref[:], sq_ref[:], metric=metric)

    base = n_idx * row_tile
    rows = base + jax.lax.broadcasted_iota(jnp.int32, (1, row_tile), 1)
    mask = alive_ref[:][None, :] & (rows < ms_ref[0])
    scores = jnp.where(mask, scores, NEG_INF)
    _merge_tile(run_v, run_i, scores, base, k=k, merge=merge)

    @pl.when(n_idx == n_tiles - 1)
    def _():
        # flush the FULL scratch (kpad wide on the bitonic path): an in-
        # kernel [:, :k] lane slice at k=100 of a 128-wide vreg crashed the
        # Mosaic lowering (limits[i] <= dim(i) SIGABRT); the k-slice and the
        # -1 missing-hit normalization happen in the wrapper instead
        vals_ref[:] = run_v[:]
        idx_ref[:] = run_i[:]


@functools.lru_cache(maxsize=None)
def _build(metric: Metric, k: int, b_pad: int, n_pad: int, d: int,
           x_dtype: str, row_tile: int, batch_tile: int, interpret: bool):
    grid = (b_pad // batch_tile, n_pad // row_tile)
    kpad, merge = _merge_params(k, row_tile)
    kernel = functools.partial(
        _scan_kernel, k=k, metric=metric, row_tile=row_tile, merge=merge
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # ms
            pl.BlockSpec((batch_tile, d), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),                     # q
            pl.BlockSpec((row_tile, d), lambda b, n: (n, 0),
                         memory_space=pltpu.VMEM),                     # x tile
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # sqnorm
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # alive
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, kpad), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, kpad), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, kpad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, kpad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch_tile, kpad), jnp.float32),
            pltpu.VMEM((batch_tile, kpad), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )


def _finish_topk(vals, idx, k: int):
    """Post-kernel: slice the kpad-wide flush to k and restore the
    masked_topk convention (-inf score, idx -1). The bitonic scratch keeps
    a masked row's real index next to its NEG_INF sentinel, so the -1
    normalization keys off the value; kernels cannot capture jnp -inf so
    missing hits carry the finite sentinel internally."""
    vals, idx = vals[:, :k], idx[:, :k]
    idx = jnp.where(vals > NEG_INF, idx, -1)
    vals = jnp.where(idx < 0, -jnp.inf, vals)
    return vals, idx


@functools.lru_cache(maxsize=None)
def _jit_flat_call(metric: Metric, k: int, b: int, n: int, d: int,
                   x_dtype: str, row_tile: int, batch_tile: int,
                   interpret: bool):
    """One-dispatch caller: pallas kernel + the _finish_topk post-ops under
    a single jit. Un-jitted per-call post-ops each cost a separate dispatch
    through the TPU tunnel (~1.8 ms), which dominated b64 serving when the
    kpad-wide flush moved the k-slice out of the kernel."""
    fn = _build(metric, k, b, n, d, x_dtype, row_tile, batch_tile, interpret)

    @jax.jit
    def call(ms, q, x, sqnorm, alive):
        vals, idx = fn(ms, q, x, sqnorm, alive)
        return _finish_topk(vals, idx, k)

    return call


def pallas_flat_topk(
    q: jax.Array,
    x: jax.Array,
    sqnorm: jax.Array,
    alive: jax.Array,
    max_scans,
    k: int,
    metric: Metric = Metric.L2,
    *,
    row_tile: int = DEFAULT_ROW_TILE,
    batch_tile: int = DEFAULT_BATCH_TILE,
) -> tuple[jax.Array, jax.Array]:
    """Fused masked scan + exact top-k. q [B, D], x [N, D] (N, B already
    padded to the tile sizes by the caller); returns ([B, k], [B, k]).

    ``max_scans`` is a Python int (cached device constant) or a traced
    int32 [1] array — the latter lets shard_map bodies pass a per-shard
    budget (global max_scans rebased to local slab rows)."""
    metric = Metric.parse(metric)
    if metric == Metric.COSINE:
        raise ValueError("pre-normalize rows and use IP for cosine")
    b, d = q.shape
    n = x.shape[0]
    row_tile = min(row_tile, n)
    if k > RANK_MERGE_MAX_K:
        # wide-k merges exceed the 16 MB scoped-vmem stack at Bt=128:
        # the extract-max fallback's [Bt, k + row_tile] fused candidates
        # (19.2 MB at k=100/T=4096) and the bitonic tile sort's [Bt, T]
        # value+index temporaries (17.2 MB measured AOT OOM) — cap the
        # batch tile at 64 for every wide-k variant
        batch_tile = min(batch_tile, 64)
    batch_tile = min(batch_tile, b)
    if n % row_tile or b % batch_tile:
        raise ValueError(f"pad shapes to tiles: n={n}%{row_tile}, b={b}%{batch_tile}")
    interpret = jax.default_backend() not in ("tpu", "axon")
    call = _jit_flat_call(metric, k, b, n, d, str(x.dtype), row_tile,
                          batch_tile, interpret)
    from pyrope_tpu.ops.scalars import device_i32x1

    ms = (max_scans if isinstance(max_scans, jax.Array)
          else device_i32x1(max_scans))
    return call(ms, q, x, sqnorm, alive)


# ---- fused dense-mask IVF scan ---------------------------------------------

def _ivf_scan_kernel(q_ref, x_ref, sq_ref, alive_ref, crow_ref, probed_ref,
                     vals_ref, idx_ref, run_v, run_i,
                     *, k: int, metric: Metric, row_tile: int,
                     promote_fp32: bool, merge: str):
    """Flat-scan kernel + probe-membership mask (the dense IVF scan).

    A corpus row survives iff its cluster is in the query's probe set. The
    per-(query, row) membership is recovered WITHOUT a gather (TPUs have no
    fast per-lane gather): probed [Bt, Kp] is a 0/1 table scattered outside
    the kernel, the tile's one-hot cluster map oh[t, c] = (crow[t] == c) is
    built from an iota, and membership = probed @ ohᵀ — one small MXU
    matmul whose 0/1 products are exact in any precision. This replaces the
    XLA dense path's [B, N] fp32 score materialization + [B, N] int32
    allowed_row gather (index/ivf_flat.py dense_probe_mask) with zero HBM
    score traffic.
    """
    n_idx = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(n_idx == 0)
    def _():
        run_v[:] = jnp.full_like(run_v, jnp.float32(NEG_INF))
        run_i[:] = jnp.full_like(run_i, -1)

    scores = _tile_scores(q_ref[:], x_ref[:], sq_ref[:], metric=metric,
                          promote_fp32=promote_fp32)

    crow = crow_ref[:]                                       # [T]
    kpad = probed_ref.shape[1]
    oh = (
        crow[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (row_tile, kpad), 1)
    ).astype(jnp.float32)                                    # [T, Kp]
    member = jax.lax.dot_general(
        probed_ref[:], oh,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [Bt, T]
    mask = alive_ref[:][None, :] & (member > 0.5)

    base = n_idx * row_tile
    scores = jnp.where(mask, scores, NEG_INF)
    _merge_tile(run_v, run_i, scores, base, k=k, merge=merge)

    @pl.when(n_idx == n_tiles - 1)
    def _():
        # flush the FULL scratch (kpad wide on the bitonic path): an in-
        # kernel [:, :k] lane slice at k=100 of a 128-wide vreg crashed the
        # Mosaic lowering (limits[i] <= dim(i) SIGABRT); the k-slice and the
        # -1 missing-hit normalization happen in the wrapper instead
        vals_ref[:] = run_v[:]
        idx_ref[:] = run_i[:]


@functools.lru_cache(maxsize=None)
def _build_ivf(metric: Metric, k: int, b_pad: int, n_pad: int, d: int,
               kpad: int, x_dtype: str, row_tile: int, batch_tile: int,
               promote_fp32: bool, interpret: bool):
    grid = (b_pad // batch_tile, n_pad // row_tile)
    scratch_k, merge = _merge_params(k, row_tile)
    kernel = functools.partial(
        _ivf_scan_kernel, k=k, metric=metric, row_tile=row_tile,
        promote_fp32=promote_fp32, merge=merge,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, d), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),                     # q
            pl.BlockSpec((row_tile, d), lambda b, n: (n, 0),
                         memory_space=pltpu.VMEM),                     # x tile
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # sqnorm
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # alive
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # crow
            pl.BlockSpec((batch_tile, kpad), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),                     # probed
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, scratch_k), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, scratch_k), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, scratch_k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, scratch_k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch_tile, scratch_k), jnp.float32),
            pltpu.VMEM((batch_tile, scratch_k), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )


# membership matmul costs ~kpad MACs/row next to the score matmul's D; cap
# the cluster-table width so the mask never dominates the scan. Wider
# cluster tables use the WINDOWED kernel below: the slab is cluster-major,
# so one corpus tile only ever touches a narrow band of clusters — the
# kernel reads that band's start from an SMEM per-tile table and builds
# the one-hot map over a fixed WINDOW of clusters instead of all kpad.
PALLAS_IVF_MAX_KPAD = 512
PALLAS_IVF_WINDOW = 256  # clusters per tile window (bf16 oh: [row_tile, W])
# Mosaic requires the dynamic sublane offset of the probe-table slice to be
# provably aligned (vector.load "index in dimension 0 is a multiple of 8"
# on real TPU); window starts are rounded DOWN to this on the host and the
# kernel asserts it with pl.multiple_of. 16 covers bf16 sublane packing.
PALLAS_IVF_WINDOW_ALIGN = 16


def padded_probe_width(kpad: int, window: int = PALLAS_IVF_WINDOW) -> int:
    """Width the transposed probe table must be padded to so every aligned
    [c0, c0+window) slice stays in range: >= window, multiple of the
    alignment (so the hi clamp ``kp - window`` stays aligned)."""
    a = PALLAS_IVF_WINDOW_ALIGN
    return max(-(-kpad // a) * a, window)


def tile_cluster_windows(
    crow, n: int, npad: int, row_tile: int, kpad: int,
    window: int = PALLAS_IVF_WINDOW,
):
    """Per-corpus-tile cluster-window table for the windowed dense kernel.

    ``crow`` is nondecreasing over the real rows of a cluster-major slab
    (pad rows at the tail carry a sentinel and are alive=False, so their
    membership value is irrelevant). ``kpad`` is the PADDED probe-table
    width the kernel will slice (``padded_probe_width`` — multiple of the
    alignment, >= window). Returns ``(tile_clo, ok)`` where ``tile_clo[i]``
    is the first cluster of tile i rounded down to the Mosaic alignment and
    clamped so the [c0, c0+window) slice stays inside the table (rounding /
    clamping down is safe: crow is nondecreasing, so every cluster in the
    tile is >= the original c_lo >= the aligned c0; the clamp still covers
    c_hi because c_hi <= kpad - 1 < hi_clamp + window), and ``ok`` is False
    when some tile's aligned span exceeds ``window`` clusters (caller falls
    back to the XLA dense kernel)."""
    import numpy as np

    a = PALLAS_IVF_WINDOW_ALIGN
    if kpad % a or window % a:
        raise ValueError(
            f"kpad/window must be {a}-aligned (use padded_probe_width): "
            f"kpad={kpad}, window={window}"
        )
    n_tiles = max(npad // row_tile, 1)
    tile_clo = np.zeros(n_tiles, np.int32)
    hi_clamp = max(kpad - window, 0)
    ok = True
    for i in range(n_tiles):
        base = i * row_tile
        if base >= n:
            continue  # all-pad tile: window irrelevant (alive=False)
        last_real = min(base + row_tile, n) - 1
        c_lo, c_hi = int(crow[base]), int(crow[last_real])
        c0 = (c_lo // a) * a
        if c_hi - c0 >= window:
            ok = False
            break
        tile_clo[i] = min(c0, hi_clamp)
    return tile_clo, ok


def _ivf_scan_windowed_kernel(
    tile_clo_ref, q_ref, x_ref, sq_ref, alive_ref, crow_ref, probed_t_ref,
    vals_ref, idx_ref, run_v, run_i,
    *, k: int, metric: Metric, row_tile: int, window: int,
    promote_fp32: bool, merge: str,
):
    """Dense-mask IVF scan for WIDE cluster tables (kpad > ~512).

    Identical to ``_ivf_scan_kernel`` except membership: instead of a
    [row_tile, kpad] one-hot against the full [Bt, kpad] probe table, the
    kernel reads this tile's first cluster ``c0`` from SMEM, slices a
    [window, Bt] band out of the TRANSPOSED probe table (sublane-dim
    dynamic slice — cheap on TPU), and contracts it with a
    [row_tile, window] one-hot built relative to ``c0``. The 0/1 operands
    run in bf16 (products exact, fp32 accumulate), so the membership
    matmul costs window (256) bf16 MACs/row next to the score matmul's
    D fp32-HIGHEST MACs."""
    n_idx = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(n_idx == 0)
    def _():
        run_v[:] = jnp.full_like(run_v, jnp.float32(NEG_INF))
        run_i[:] = jnp.full_like(run_i, -1)

    scores = _tile_scores(q_ref[:], x_ref[:], sq_ref[:], metric=metric,
                          promote_fp32=promote_fp32)

    # host-aligned (tile_cluster_windows) + asserted so Mosaic can prove
    # the dynamic sublane offset of the vector load
    c0 = pl.multiple_of(tile_clo_ref[n_idx], PALLAS_IVF_WINDOW_ALIGN)
    pw = probed_t_ref[pl.ds(c0, window), :]                  # [W, Bt] bf16
    crow = crow_ref[:]                                       # [T]
    oh = (
        (crow[:, None] - c0)
        == jax.lax.broadcasted_iota(jnp.int32, (row_tile, window), 1)
    ).astype(jnp.bfloat16)                                   # [T, W]
    member = jax.lax.dot_general(
        pw, oh,
        (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [Bt, T]
    mask = alive_ref[:][None, :] & (member > 0.5)

    base = n_idx * row_tile
    scores = jnp.where(mask, scores, NEG_INF)
    _merge_tile(run_v, run_i, scores, base, k=k, merge=merge)

    @pl.when(n_idx == n_tiles - 1)
    def _():
        # flush the FULL scratch (kpad wide on the bitonic path): an in-
        # kernel [:, :k] lane slice at k=100 of a 128-wide vreg crashed the
        # Mosaic lowering (limits[i] <= dim(i) SIGABRT); the k-slice and the
        # -1 missing-hit normalization happen in the wrapper instead
        vals_ref[:] = run_v[:]
        idx_ref[:] = run_i[:]


@functools.lru_cache(maxsize=None)
def _build_ivf_windowed(
    metric: Metric, k: int, b_pad: int, n_pad: int, d: int, kpad: int,
    x_dtype: str, row_tile: int, batch_tile: int, window: int,
    promote_fp32: bool, interpret: bool,
):
    grid = (b_pad // batch_tile, n_pad // row_tile)
    scratch_k, merge = _merge_params(k, row_tile)
    kernel = functools.partial(
        _ivf_scan_windowed_kernel, k=k, metric=metric, row_tile=row_tile,
        window=window, promote_fp32=promote_fp32, merge=merge,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # tile_clo
            pl.BlockSpec((batch_tile, d), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),                     # q
            pl.BlockSpec((row_tile, d), lambda b, n: (n, 0),
                         memory_space=pltpu.VMEM),                     # x tile
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # sqnorm
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # alive
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # crow
            pl.BlockSpec((kpad, batch_tile), lambda b, n: (0, b),
                         memory_space=pltpu.VMEM),                     # probedT
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, scratch_k), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, scratch_k), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, scratch_k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, scratch_k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch_tile, scratch_k), jnp.float32),
            pltpu.VMEM((batch_tile, scratch_k), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )


def pallas_ivf_topk_windowed(
    q: jax.Array,
    x: jax.Array,
    sqnorm: jax.Array,
    alive: jax.Array,
    crow: jax.Array,
    probed_t: jax.Array,
    tile_clo: jax.Array,
    k: int,
    metric: Metric = Metric.L2,
    *,
    promote_fp32: bool = False,
    row_tile: int = DEFAULT_ROW_TILE,
    batch_tile: int = 64,
    window: int = PALLAS_IVF_WINDOW,
) -> tuple[jax.Array, jax.Array]:
    """Windowed fused dense-mask IVF scan (kpad > PALLAS_IVF_MAX_KPAD).

    probed_t: [Kp, B] 0/1 bf16 TRANSPOSED probe table (Kp >= window);
    tile_clo: [npad // row_tile] int32 per-tile first cluster (see
    ``tile_cluster_windows``). Other args as ``pallas_ivf_topk``."""
    metric = Metric.parse(metric)
    if metric == Metric.COSINE:
        raise ValueError("pre-normalize rows and use IP for cosine")
    b, d = q.shape
    n = x.shape[0]
    kpad = probed_t.shape[0]
    row_tile = min(row_tile, n)
    if k > RANK_MERGE_MAX_K:
        batch_tile = min(batch_tile, 64)  # wide-k scoped-vmem cap, see pallas_flat_topk
    batch_tile = min(batch_tile, b)
    if n % row_tile or b % batch_tile:
        raise ValueError(f"pad shapes to tiles: n={n}%{row_tile}, b={b}%{batch_tile}")
    if kpad < window:
        raise ValueError(f"probed_t must be padded to >= window ({kpad} < {window})")
    interpret = jax.default_backend() not in ("tpu", "axon")
    fn = _build_ivf_windowed(metric, k, b, n, d, kpad, str(x.dtype),
                             row_tile, batch_tile, window, promote_fp32,
                             interpret)
    vals, idx = fn(tile_clo, q, x, sqnorm, alive, crow, probed_t)
    return _finish_topk(vals, idx, k)


def pallas_ivf_topk(
    q: jax.Array,
    x: jax.Array,
    sqnorm: jax.Array,
    alive: jax.Array,
    crow: jax.Array,
    probed: jax.Array,
    k: int,
    metric: Metric = Metric.L2,
    *,
    promote_fp32: bool = False,
    row_tile: int = DEFAULT_ROW_TILE,
    batch_tile: int = DEFAULT_BATCH_TILE,
) -> tuple[jax.Array, jax.Array]:
    """Fused dense-mask IVF scan + exact top-k (full-scan semantics: the
    max_scans budget is NOT applied here — callers fall back to the XLA
    dense/probe kernels when a budget is set, where eff < lens matters).

    q [B, D]; x [N, D] slab (cluster-major); crow [N] cluster-of-row;
    probed [B, Kp] 0/1 fp32 probe table. B, N pre-padded to the tiles.
    Returns ([B, k], [B, k]) with the masked_topk missing-hit convention."""
    metric = Metric.parse(metric)
    if metric == Metric.COSINE:
        raise ValueError("pre-normalize rows and use IP for cosine")
    b, d = q.shape
    n = x.shape[0]
    kpad = probed.shape[1]
    row_tile = min(row_tile, n)
    if k > RANK_MERGE_MAX_K:
        batch_tile = min(batch_tile, 64)  # wide-k scoped-vmem cap, see pallas_flat_topk
    batch_tile = min(batch_tile, b)
    if n % row_tile or b % batch_tile:
        raise ValueError(f"pad shapes to tiles: n={n}%{row_tile}, b={b}%{batch_tile}")
    interpret = jax.default_backend() not in ("tpu", "axon")
    fn = _build_ivf(metric, k, b, n, d, kpad, str(x.dtype), row_tile,
                    batch_tile, promote_fp32, interpret)
    vals, idx = fn(q, x, sqnorm, alive, crow, probed)
    return _finish_topk(vals, idx, k)


# ---- fused dense-mask IVF scan over a residual-SQ8 slab ---------------------
# The memory-lean rerank storage (VERDICT r4 #2): rows live as uint8
# residual codes + per-row (min, scale); reconstruction x̂ = c[crow] + min +
# scale*code happens IN the score algebra, never materialized:
#
#   q·x̂ = qc[b, crow] + (q @ codesᵀ)·scale + (Σq)·min
#
# The qc term and the probe mask ride ONE one-hot contraction: tq[b, c] =
# qc[b, c] where probed else SENTINEL, sel = tq @ onehot(crow)ᵀ — the same
# membership matmul the fp32 kernels already pay, now also carrying the
# centroid dots (exact: a one-hot row selects one fp32 entry). HBM slab
# traffic is 1/4 of the fp32 kernel's; the uint8->fp32 convert is VPU work
# inside VMEM tiles.

MASK_SENT = -1.0e30          # tq sentinel for unprobed clusters
MASK_SENT_THRESH = -1.0e29   # sel below this = masked row


def _tile_scores_sq8(q, codes, mins, scales, sq, sel, live, *, metric: Metric):
    """Score one residual-SQ8 corpus tile: q [Bt, D] fp32, codes [T, D]
    uint8, mins/scales/sq [T] fp32, sel [Bt, T] = qc[b, crow[t]] (masked
    entries carry the sentinel and are neutralized via ``live``)."""
    # Mosaic has no unsigned->float cast; int32 hop is exact for 0..255
    x8 = codes.astype(jnp.int32).astype(jnp.float32)
    dots8 = jax.lax.dot_general(
        q, x8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                        # [Bt, T]
    qsum = jnp.sum(q, axis=1, keepdims=True)                 # [Bt, 1]
    qx = jnp.where(live, sel, 0.0) + dots8 * scales[None, :] + qsum * mins[None, :]
    if metric == Metric.L2:
        qq = jnp.sum(q * q, axis=1, keepdims=True)
        return -jnp.maximum(qq - 2.0 * qx + sq[None, :], 0.0)
    return qx  # IP (cosine rows pre-normalized upstream)


def _ivf_sq8_scan_kernel(q_ref, x_ref, mn_ref, sc_ref, sq_ref, alive_ref,
                         crow_ref, tq_ref, vals_ref, idx_ref, run_v, run_i,
                         *, k: int, metric: Metric, row_tile: int,
                         merge: str):
    n_idx = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(n_idx == 0)
    def _():
        run_v[:] = jnp.full_like(run_v, jnp.float32(NEG_INF))
        run_i[:] = jnp.full_like(run_i, -1)

    crow = crow_ref[:]                                       # [T]
    kpad = tq_ref.shape[1]
    oh = (
        crow[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (row_tile, kpad), 1)
    ).astype(jnp.float32)                                    # [T, Kp]
    # one matmul carries BOTH the probe mask and the centroid dots: HIGHEST
    # keeps the selected qc entries bit-exact (one-hot products are exact
    # in any precision; the fp32 VALUES must not be demoted to bf16 passes)
    sel = jax.lax.dot_general(
        tq_ref[:], oh,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                        # [Bt, T]
    live = sel > MASK_SENT_THRESH
    scores = _tile_scores_sq8(q_ref[:], x_ref[:], mn_ref[:], sc_ref[:],
                              sq_ref[:], sel, live, metric=metric)
    mask = alive_ref[:][None, :] & live

    base = n_idx * row_tile
    scores = jnp.where(mask, scores, NEG_INF)
    _merge_tile(run_v, run_i, scores, base, k=k, merge=merge)

    @pl.when(n_idx == n_tiles - 1)
    def _():
        vals_ref[:] = run_v[:]
        idx_ref[:] = run_i[:]


@functools.lru_cache(maxsize=None)
def _build_ivf_sq8(metric: Metric, k: int, b_pad: int, n_pad: int, d: int,
                   kpad: int, row_tile: int, batch_tile: int,
                   interpret: bool):
    grid = (b_pad // batch_tile, n_pad // row_tile)
    scratch_k, merge = _merge_params(k, row_tile)
    kernel = functools.partial(
        _ivf_sq8_scan_kernel, k=k, metric=metric, row_tile=row_tile,
        merge=merge,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, d), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),                     # q
            pl.BlockSpec((row_tile, d), lambda b, n: (n, 0),
                         memory_space=pltpu.VMEM),                     # codes
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # mins
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # scales
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # sqnorm
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # alive
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # crow
            pl.BlockSpec((batch_tile, kpad), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),                     # tq
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, scratch_k), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, scratch_k), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, scratch_k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, scratch_k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch_tile, scratch_k), jnp.float32),
            pltpu.VMEM((batch_tile, scratch_k), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )


def pallas_ivf_sq8_topk(
    q: jax.Array,
    codes: jax.Array,
    mins: jax.Array,
    scales: jax.Array,
    sqnorm: jax.Array,
    alive: jax.Array,
    crow: jax.Array,
    tq: jax.Array,
    k: int,
    metric: Metric = Metric.L2,
    *,
    row_tile: int = DEFAULT_ROW_TILE,
    batch_tile: int = DEFAULT_BATCH_TILE,
) -> tuple[jax.Array, jax.Array]:
    """Fused dense-mask IVF scan over a residual-SQ8 slab (kpad <= ~512).

    codes [N, D] uint8 residual codes; mins/scales/sqnorm [N] fp32 (sqnorm
    is ||x̂||² of the reconstruction); tq [B, Kp] fp32 = q·cᵀ where probed,
    MASK_SENT where not (build with ``sq8_probe_table``). Full-scan
    semantics like pallas_ivf_topk."""
    metric = Metric.parse(metric)
    if metric == Metric.COSINE:
        raise ValueError("pre-normalize rows and use IP for cosine")
    b, d = q.shape
    n = codes.shape[0]
    kpad = tq.shape[1]
    row_tile = min(row_tile, n)
    if k > RANK_MERGE_MAX_K:
        batch_tile = min(batch_tile, 64)  # wide-k scoped-vmem cap
    batch_tile = min(batch_tile, b)
    if n % row_tile or b % batch_tile:
        raise ValueError(f"pad shapes to tiles: n={n}%{row_tile}, b={b}%{batch_tile}")
    interpret = jax.default_backend() not in ("tpu", "axon")
    fn = _build_ivf_sq8(metric, k, b, n, d, kpad, row_tile, batch_tile,
                        interpret)
    vals, idx = fn(q, codes, mins, scales, sqnorm, alive, crow, tq)
    return _finish_topk(vals, idx, k)


def _ivf_sq8_scan_windowed_kernel(
    tile_clo_ref, q_ref, x_ref, mn_ref, sc_ref, sq_ref, alive_ref, crow_ref,
    tq_t_ref, vals_ref, idx_ref, run_v, run_i,
    *, k: int, metric: Metric, row_tile: int, window: int, merge: str,
):
    """Residual-SQ8 dense scan for WIDE cluster tables: the [window, Bt]
    band of the TRANSPOSED tq table replaces the full [Bt, Kp] operand
    (same mechanism as _ivf_scan_windowed_kernel, fp32 HIGHEST because the
    band carries centroid DOTS, not 0/1)."""
    n_idx = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(n_idx == 0)
    def _():
        run_v[:] = jnp.full_like(run_v, jnp.float32(NEG_INF))
        run_i[:] = jnp.full_like(run_i, -1)

    c0 = pl.multiple_of(tile_clo_ref[n_idx], PALLAS_IVF_WINDOW_ALIGN)
    tw = tq_t_ref[pl.ds(c0, window), :]                      # [W, Bt] fp32
    crow = crow_ref[:]                                       # [T]
    oh = (
        (crow[:, None] - c0)
        == jax.lax.broadcasted_iota(jnp.int32, (row_tile, window), 1)
    ).astype(jnp.float32)                                    # [T, W]
    sel = jax.lax.dot_general(
        tw, oh,
        (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                        # [Bt, T]
    live = sel > MASK_SENT_THRESH
    scores = _tile_scores_sq8(q_ref[:], x_ref[:], mn_ref[:], sc_ref[:],
                              sq_ref[:], sel, live, metric=metric)
    mask = alive_ref[:][None, :] & live

    base = n_idx * row_tile
    scores = jnp.where(mask, scores, NEG_INF)
    _merge_tile(run_v, run_i, scores, base, k=k, merge=merge)

    @pl.when(n_idx == n_tiles - 1)
    def _():
        vals_ref[:] = run_v[:]
        idx_ref[:] = run_i[:]


@functools.lru_cache(maxsize=None)
def _build_ivf_sq8_windowed(
    metric: Metric, k: int, b_pad: int, n_pad: int, d: int, kpad: int,
    row_tile: int, batch_tile: int, window: int, interpret: bool,
):
    grid = (b_pad // batch_tile, n_pad // row_tile)
    scratch_k, merge = _merge_params(k, row_tile)
    kernel = functools.partial(
        _ivf_sq8_scan_windowed_kernel, k=k, metric=metric,
        row_tile=row_tile, window=window, merge=merge,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # tile_clo
            pl.BlockSpec((batch_tile, d), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),                     # q
            pl.BlockSpec((row_tile, d), lambda b, n: (n, 0),
                         memory_space=pltpu.VMEM),                     # codes
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # mins
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # scales
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # sqnorm
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # alive
            pl.BlockSpec((row_tile,), lambda b, n: (n,),
                         memory_space=pltpu.VMEM),                     # crow
            pl.BlockSpec((kpad, batch_tile), lambda b, n: (0, b),
                         memory_space=pltpu.VMEM),                     # tqT
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, scratch_k), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, scratch_k), lambda b, n: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, scratch_k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, scratch_k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch_tile, scratch_k), jnp.float32),
            pltpu.VMEM((batch_tile, scratch_k), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )


def pallas_ivf_sq8_topk_windowed(
    q: jax.Array,
    codes: jax.Array,
    mins: jax.Array,
    scales: jax.Array,
    sqnorm: jax.Array,
    alive: jax.Array,
    crow: jax.Array,
    tq_t: jax.Array,
    tile_clo: jax.Array,
    k: int,
    metric: Metric = Metric.L2,
    *,
    row_tile: int = DEFAULT_ROW_TILE,
    batch_tile: int = 64,
    window: int = PALLAS_IVF_WINDOW,
) -> tuple[jax.Array, jax.Array]:
    """Windowed residual-SQ8 dense scan (kpad > PALLAS_IVF_MAX_KPAD).

    tq_t: [Kp, B] fp32 TRANSPOSED masked-qc table (``sq8_probe_table``
    output transposed); other args as pallas_ivf_sq8_topk."""
    metric = Metric.parse(metric)
    if metric == Metric.COSINE:
        raise ValueError("pre-normalize rows and use IP for cosine")
    b, d = q.shape
    n = codes.shape[0]
    kpad = tq_t.shape[0]
    row_tile = min(row_tile, n)
    if k > RANK_MERGE_MAX_K:
        batch_tile = min(batch_tile, 64)
    batch_tile = min(batch_tile, b)
    if n % row_tile or b % batch_tile:
        raise ValueError(f"pad shapes to tiles: n={n}%{row_tile}, b={b}%{batch_tile}")
    if kpad < window:
        raise ValueError(f"tq_t must be padded to >= window ({kpad} < {window})")
    interpret = jax.default_backend() not in ("tpu", "axon")
    fn = _build_ivf_sq8_windowed(metric, k, b, n, d, kpad, row_tile,
                                 batch_tile, window, interpret)
    vals, idx = fn(tile_clo, q, codes, mins, scales, sqnorm, alive, crow, tq_t)
    return _finish_topk(vals, idx, k)
