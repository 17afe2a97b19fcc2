"""Pallas fused scan+top-k kernel (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyrope_tpu.ops.pallas_scan import pallas_flat_topk
from pyrope_tpu.types import Metric


def ref_topk(q, x, sq, alive, ms, k, metric):
    dots = q @ x.T
    if metric == Metric.L2:
        scores = -np.maximum((q * q).sum(1)[:, None] - 2 * dots + sq[None, :], 0)
    else:
        scores = dots
    mask = alive & (np.arange(x.shape[0]) < ms)
    scores = np.where(mask[None, :], scores, -np.inf)
    idx = np.argsort(-scores, axis=1)[:, :k]
    return scores, idx


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT])
def test_exact_vs_numpy(metric):
    rng = np.random.default_rng(0)
    n, b, d, k = 4096, 64, 32, 10
    x = rng.random((n, d), np.float32)
    q = rng.random((b, d), np.float32)
    sq = np.einsum("nd,nd->n", x, x).astype(np.float32)
    alive = np.ones(n, bool)
    alive[7:50] = False
    ms = 4000
    vals, idx = pallas_flat_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        ms, k, metric,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    scores, ref_idx = ref_topk(q, x, sq, alive, ms, k, metric)
    for bi in range(b):
        assert set(idx[bi]) == set(ref_idx[bi])
    assert np.allclose(vals, np.take_along_axis(scores, idx, axis=1),
                       rtol=1e-4, atol=1e-4)


def test_fewer_live_than_k_reports_minus_one():
    rng = np.random.default_rng(1)
    n, b, d, k = 1024, 64, 16, 10
    x = rng.random((n, d), np.float32)
    q = rng.random((b, d), np.float32)
    sq = np.einsum("nd,nd->n", x, x).astype(np.float32)
    alive = np.zeros(n, bool)
    alive[:3] = True  # only 3 live rows
    vals, idx = pallas_flat_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        n, k, Metric.L2,
    )
    idx = np.asarray(idx)
    assert set(idx[0][:3]) == {0, 1, 2}
    assert all(i == -1 for i in idx[0][3:])


def test_shape_validation():
    with pytest.raises(ValueError):  # 3000 not divisible by clamped tile
        pallas_flat_topk(
            jnp.zeros((64, 8)), jnp.zeros((3000, 8)), jnp.zeros(3000),
            jnp.ones(3000, bool), 3000, 5, Metric.L2, row_tile=2048,
        )
    with pytest.raises(ValueError):
        pallas_flat_topk(
            jnp.zeros((64, 8)), jnp.zeros((1024, 8)), jnp.zeros(1024),
            jnp.ones(1024, bool), 1024, 5, Metric.COSINE,
        )


def test_flat_index_pallas_selection():
    rng = np.random.default_rng(2)
    from pyrope_tpu.index.flat import FlatIndex

    n, d = 3000, 16
    vecs = rng.random((n, d), np.float32)
    exact = FlatIndex(d, "L2")
    pall = FlatIndex(d, "L2", selection="pallas")
    ids = [str(i) for i in range(n)]
    exact.add_batch(ids, vecs)
    pall.add_batch(ids, vecs)
    q = rng.random((5, d), np.float32)
    r1 = exact.search_batch(q, 10)
    r2 = pall.search_batch(q, 10)
    assert [[h.id for h in row] for row in r1] == [[h.id for h in row] for row in r2]
    # delete + max_scans also flow through the kernel
    pall.delete("42")
    hits = pall.search(vecs[42], 5)
    assert all(h.id != "42" for h in hits)


# ---- wide-k bitonic merge (k > RANK_MERGE_MAX_K) ----------------------------

def _stable_ref(q, x, sq, alive, ms, k, metric):
    """(value desc, row asc) reference order — np stable argsort."""
    scores, _ = ref_topk(q, x, sq, alive, ms, k, metric)
    return scores, np.argsort(-scores, axis=1, kind="stable")[:, :k]


@pytest.mark.parametrize("k", [50, 100])
def test_wide_k_bitonic_exact_order(k):
    rng = np.random.default_rng(13)
    n, b, d = 16384, 16, 16
    x = rng.random((n, d), np.float32)
    x[200] = x[100]          # duplicate rows force score ties
    x[4096 + 7] = x[100]     # ...across tiles too
    q = rng.random((b, d), np.float32)
    q[0] = x[100]
    sq = np.einsum("nd,nd->n", x, x).astype(np.float32)
    alive = np.ones(n, bool)
    alive[50:90] = False
    ms = n - 100
    vals, idx = pallas_flat_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        ms, k, Metric.L2,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    scores, ref_idx = _stable_ref(q, x, sq, alive, ms, k, Metric.L2)
    np.testing.assert_array_equal(idx, ref_idx)  # exact order incl. ties
    np.testing.assert_allclose(
        vals, np.take_along_axis(scores, ref_idx, axis=1), rtol=1e-5, atol=1e-5
    )


def test_wide_k_fewer_live_than_k_reports_minus_one():
    rng = np.random.default_rng(14)
    n, b, d, k = 4096, 8, 16, 100
    x = rng.random((n, d), np.float32)
    q = rng.random((b, d), np.float32)
    sq = np.einsum("nd,nd->n", x, x).astype(np.float32)
    alive = np.zeros(n, bool)
    alive[:7] = True
    vals, idx = pallas_flat_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        n, k, Metric.L2,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert set(idx[0][:7]) == set(range(7))
    assert (idx[:, 7:] == -1).all()
    assert np.isneginf(vals[:, 7:]).all()


def test_wide_k_fallback_matches_bitonic():
    # a non-power-of-two row tile routes to the extract-max fallback; the
    # hit lists must be identical to the bitonic path's
    rng = np.random.default_rng(15)
    n, b, d, k = 3072, 8, 16, 40
    x = rng.random((n, d), np.float32)
    q = rng.random((b, d), np.float32)
    sq = np.einsum("nd,nd->n", x, x).astype(np.float32)
    alive = np.ones(n, bool)
    v1, i1 = pallas_flat_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        n, k, Metric.L2, row_tile=1536,  # non-pow2 -> fallback
    )
    v2, i2 = pallas_flat_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        n, k, Metric.L2, row_tile=1024,  # pow2 -> bitonic
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)


def test_wide_k_ivf_kernel():
    from pyrope_tpu.ops.pallas_scan import pallas_ivf_topk

    n, b, d, k, kc = 8192, 8, 16, 64, 17
    x, q, sq, alive, crow, probed, probe = _mk_ivf_case(16, n, b, d, k, kc,
                                                        Metric.L2)
    vals, idx = pallas_ivf_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        jnp.asarray(crow), jnp.asarray(probed), k, Metric.L2,
    )
    idx = np.asarray(idx)
    dots = q @ x.T
    scores = -np.maximum((q * q).sum(1)[:, None] - 2 * dots + sq[None, :], 0)
    member = np.stack([np.isin(crow, probe[bi]) for bi in range(b)])
    scores = np.where(member & alive[None, :], scores, -np.inf)
    ref_idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    ref_idx = np.where(
        np.take_along_axis(scores, ref_idx, axis=1) > -np.inf, ref_idx, -1
    )
    np.testing.assert_array_equal(idx, ref_idx)


# ---- fused dense-mask IVF kernel -------------------------------------------

def _mk_ivf_case(seed, n, b, d, k, kc, metric):
    rng = np.random.default_rng(seed)
    x = rng.random((n, d), np.float32)
    q = rng.random((b, d), np.float32)
    sq = np.einsum("nd,nd->n", x, x).astype(np.float32)
    alive = np.ones(n, bool)
    alive[5:40] = False
    # cluster-major crow: contiguous runs
    lens = rng.multinomial(n, np.ones(kc) / kc)
    crow = np.repeat(np.arange(kc, dtype=np.int32), lens)
    probe = np.stack([
        rng.choice(kc, size=3, replace=False) for _ in range(b)
    ]).astype(np.int32)
    kp = 128
    probed = np.zeros((b, kp), np.float32)
    probed[np.arange(b)[:, None], probe] = 1.0
    return x, q, sq, alive, crow, probed, probe


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT])
def test_ivf_kernel_vs_numpy(metric):
    from pyrope_tpu.ops.pallas_scan import pallas_ivf_topk

    n, b, d, k, kc = 4096, 64, 32, 10, 17
    x, q, sq, alive, crow, probed, probe = _mk_ivf_case(3, n, b, d, k, kc, metric)
    vals, idx = pallas_ivf_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        jnp.asarray(crow), jnp.asarray(probed), k, metric,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    dots = q @ x.T
    if metric == Metric.L2:
        scores = -np.maximum((q * q).sum(1)[:, None] - 2 * dots
                             + sq[None, :], 0)
    else:
        scores = dots
    member = np.isin(crow[None, :].repeat(b, 0),  # membership per query
                     np.zeros(0))  # placeholder, replaced below
    member = np.stack([np.isin(crow, probe[bi]) for bi in range(b)])
    scores = np.where(member & alive[None, :], scores, -np.inf)
    ref_idx = np.argsort(-scores, axis=1)[:, :k]
    for bi in range(b):
        assert set(idx[bi]) == set(ref_idx[bi])


def test_ivf_index_pallas_matches_exact_dense():
    import pyrope_tpu as pt
    from pyrope_tpu.types import SearchOptions

    rng = np.random.default_rng(7)
    base = rng.normal(size=(3000, 24)).astype(np.float32)
    ids = [str(i) for i in range(3000)]
    q = rng.normal(size=(8, 24)).astype(np.float32)
    a = pt.IvfFlatIndex(24, "L2", nlist=16, nprobe=4, selection="exact",
                        scan_mode="dense")
    b = pt.IvfFlatIndex(24, "L2", nlist=16, nprobe=4, selection="pallas",
                        scan_mode="dense")
    for ix in (a, b):
        ix.add_batch(ids, base)
        ix.build()
    ra = a.search_batch(q, 10)
    rb = b.search_batch(q, 10)
    for ha, hb in zip(ra, rb):
        assert [h.id for h in ha] == [h.id for h in hb]
        assert np.allclose([h.score for h in ha], [h.score for h in hb])


def test_ivf_pallas_falls_back_on_max_scans():
    """A max_scans budget must route to the XLA kernels (eff < lens) and
    still produce the budgeted hit set."""
    import pyrope_tpu as pt
    from pyrope_tpu.types import SearchOptions

    rng = np.random.default_rng(8)
    base = rng.normal(size=(2000, 16)).astype(np.float32)
    ids = [str(i) for i in range(2000)]
    q = rng.normal(size=(4, 16)).astype(np.float32)
    a = pt.IvfFlatIndex(16, "L2", nlist=8, nprobe=8, selection="exact",
                        scan_mode="dense")
    b = pt.IvfFlatIndex(16, "L2", nlist=8, nprobe=8, selection="auto",
                        scan_mode="dense")
    for ix in (a, b):
        ix.add_batch(ids, base)
        ix.build()
    opts = pt.SearchOptions(max_scans=500)
    ra = a.search_batch(q, 5, opts)
    rb = b.search_batch(q, 5, opts)
    for ha, hb in zip(ra, rb):
        assert [h.id for h in ha] == [h.id for h in hb]


def test_ivfpq_dense_pallas_matches_xla_exact():
    """refine>0 dense path: fused kernel (bf16 slab promoted in-kernel)
    must match the XLA dense-exact scan."""
    import pyrope_tpu as pt
    from pyrope_tpu.index import ivf_pq as pqmod

    rng = np.random.default_rng(9)
    base = rng.normal(size=(4000, 32)).astype(np.float32)
    ids = [str(i) for i in range(4000)]
    q = rng.normal(size=(8, 32)).astype(np.float32)
    ix = pt.IvfPqIndex(32, "L2", nlist=16, pq_m=4, ksub=16, nprobe=4,
                       scan_mode="dense")
    ix.add_batch(ids, base)
    ix.build()
    r_fused = ix.search_batch(q, 10)

    # force the XLA dense-exact path by monkeypatching eligibility off
    from pyrope_tpu.index import ivf_flat as ivmod
    orig = ivmod.pallas_dense_ok
    try:
        ivmod.pallas_dense_ok = lambda *a, **k: False
        r_xla = ix.search_batch(q, 10)
    finally:
        ivmod.pallas_dense_ok = orig
    for ha, hb in zip(r_fused, r_xla):
        assert [h.id for h in ha] == [h.id for h in hb]
        assert np.allclose([h.score for h in ha], [h.score for h in hb],
                           rtol=1e-5, atol=1e-5)


# ---- windowed dense-mask IVF kernel (wide cluster tables) ------------------

def test_tile_cluster_windows():
    from pyrope_tpu.ops.pallas_scan import tile_cluster_windows

    # 8192 rows, 2 tiles of 4096; clusters of 32 rows -> 128/tile
    crow = np.repeat(np.arange(256, dtype=np.int32), 32)
    clo, ok = tile_cluster_windows(crow, 8192, 8192, 4096, kpad=256,
                                   window=256)
    assert ok and list(clo) == [0, 0]  # tile1 c_lo=128, clamped to 256-256=0
    # narrow window -> span violation
    _, ok = tile_cluster_windows(crow, 8192, 8192, 4096, kpad=256, window=64)
    assert not ok
    # all-pad tail tile is ignored
    clo, ok = tile_cluster_windows(crow[:4096], 4096, 8192, 4096, kpad=256,
                                   window=256)
    assert ok and clo[1] == 0


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT])
def test_ivf_windowed_kernel_vs_numpy(metric):
    from pyrope_tpu.ops.pallas_scan import (
        pallas_ivf_topk_windowed,
        tile_cluster_windows,
    )

    n, b, d, k, kc = 16384, 16, 32, 10, 640  # kc > PALLAS_IVF_MAX_KPAD
    rng = np.random.default_rng(11)
    x = rng.random((n, d), np.float32)
    q = rng.random((b, d), np.float32)
    sq = np.einsum("nd,nd->n", x, x).astype(np.float32)
    alive = np.ones(n, bool)
    alive[5:40] = False
    lens = rng.multinomial(n, np.ones(kc) / kc)
    crow = np.repeat(np.arange(kc, dtype=np.int32), lens)
    probe = np.stack([
        rng.choice(kc, size=5, replace=False) for _ in range(b)
    ]).astype(np.int32)
    kp = 640
    probed_t = np.zeros((kp, b), np.float32)
    probed_t[probe.T, np.arange(b)[None, :]] = 1.0
    tile_clo, ok = tile_cluster_windows(crow, n, n, 4096, kpad=kp)
    assert ok  # ~160 clusters per 4096-row tile fits the 256 window
    vals, idx = pallas_ivf_topk_windowed(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        jnp.asarray(crow), jnp.asarray(probed_t, dtype=jnp.bfloat16),
        jnp.asarray(tile_clo), k, metric,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    dots = q @ x.T
    if metric == Metric.L2:
        scores = -np.maximum((q * q).sum(1)[:, None] - 2 * dots
                             + sq[None, :], 0)
    else:
        scores = dots
    member = np.stack([np.isin(crow, probe[bi]) for bi in range(b)])
    scores = np.where(member & alive[None, :], scores, -np.inf)
    ref_idx = np.argsort(-scores, axis=1)[:, :k]
    for bi in range(b):
        assert set(idx[bi]) == set(ref_idx[bi])


def test_ivf_index_windowed_matches_probe():
    """nlist > 512 routes the dense path to the windowed kernel; hit sets
    must equal the probe kernel's (identical-hit-set invariant)."""
    import pyrope_tpu as pt

    rng = np.random.default_rng(12)
    base = rng.normal(size=(20000, 16)).astype(np.float32)
    ids = [str(i) for i in range(20000)]
    q = rng.normal(size=(8, 16)).astype(np.float32)
    a = pt.IvfFlatIndex(16, "L2", nlist=600, nprobe=32, scan_mode="probe")
    b = pt.IvfFlatIndex(16, "L2", nlist=600, nprobe=32, scan_mode="dense")
    for ix in (a, b):
        ix.add_batch(ids, base)
        ix.build()
    assert b.describe_scan(8) == "dense-pallas-win", b.describe_scan(8)
    ra = a.search_batch(q, 10)
    rb = b.search_batch(q, 10)
    for ha, hb in zip(ra, rb):
        assert [h.id for h in ha] == [h.id for h in hb]
        assert np.allclose([h.score for h in ha], [h.score for h in hb],
                           atol=1e-4)


def test_pick_row_tile_dim_aware():
    """High-dim slabs must shrink the row tile so the double-buffered
    [row_tile, D] corpus tile stays inside the 16 MB scoped-vmem stack
    (d=768 fp32 at row_tile 4096 measured a 24.65 MB AOT OOM on v5e)."""
    from pyrope_tpu.ops.pallas_scan import X_TILE_BUDGET_BYTES, pick_row_tile

    assert pick_row_tile(1_000_000, 128, "float32") == 4096
    assert pick_row_tile(1_000_000, 128, "bfloat16") == 4096
    rt768 = pick_row_tile(1_000_000, 768, "float32")
    assert rt768 * 768 * 4 <= X_TILE_BUDGET_BYTES
    assert rt768 == 1024
    assert pick_row_tile(1_000_000, 768, "bfloat16") == 2048
    assert pick_row_tile(1_000_000, 1024, "float32") == 1024
    # floor + n clamp
    assert pick_row_tile(1_000_000, 65536, "float32") == 256
    assert pick_row_tile(640, 768, "float32") == 640
    # every pick divides the 4096-aligned slab padding
    for d in (64, 128, 256, 768, 1024, 2048):
        assert 4096 % pick_row_tile(10**6, d, "float32") == 0


def test_high_dim_flat_kernel_vs_numpy():
    """The fused flat kernel at an embedding-realistic width (d=768) — the
    shape that OOM'd scoped vmem before row tiles became dim-aware."""
    from pyrope_tpu.ops.pallas_scan import pick_row_tile

    rng = np.random.default_rng(7)
    n, b, d, k = 4096, 16, 768, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    sq = np.einsum("nd,nd->n", x, x).astype(np.float32)
    alive = np.ones(n, bool)
    rt = pick_row_tile(n, d, "float32")
    assert rt < n  # the dim-aware pick actually kicked in
    vals, idx = pallas_flat_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(sq), jnp.asarray(alive),
        n, k, Metric.L2, row_tile=rt,
    )
    idx = np.asarray(idx)
    _, ref_idx = ref_topk(q, x, sq, alive, n, k, Metric.L2)
    for bi in range(b):
        assert set(idx[bi]) == set(ref_idx[bi])


def test_high_dim_ivf_windowed_index():
    """IVF dense-window path at d=768 with a wide cluster table: the config
    class that hit the scoped-vmem OOM (ivf1m_d768). Verifies the build-time
    tile_clo grid matches the call-time kernel grid."""
    import pyrope_tpu as pt

    rng = np.random.default_rng(13)
    n, d = 6000, 768
    base = rng.normal(size=(n, d)).astype(np.float32)
    ids = [str(i) for i in range(n)]
    q = rng.normal(size=(4, d)).astype(np.float32)
    a = pt.IvfFlatIndex(d, "L2", nlist=600, nprobe=64, scan_mode="probe")
    b = pt.IvfFlatIndex(d, "L2", nlist=600, nprobe=64, scan_mode="dense")
    for ix in (a, b):
        ix.add_batch(ids, base)
        ix.build()
    assert b.describe_scan(4) == "dense-pallas-win", b.describe_scan(4)
    ra = a.search_batch(q, 10)
    rb = b.search_batch(q, 10)
    for ha, hb in zip(ra, rb):
        assert [h.id for h in ha] == [h.id for h in hb]


# ---- residual-SQ8 dense-mask IVF kernels ------------------------------------

def _sq8res_fixture(n, b, d, kc, seed=21):
    """Cluster-major corpus + residual-SQ8 encoding + random probe sets."""
    rng = np.random.default_rng(seed)
    x = rng.random((n, d), np.float32)
    q = rng.random((b, d), np.float32)
    lens = rng.multinomial(n, np.ones(kc) / kc)
    crow = np.repeat(np.arange(kc, dtype=np.int32), lens)
    cents = np.zeros((kc, d), np.float32)
    for c in range(kc):
        rows = x[crow == c]
        if len(rows):
            cents[c] = rows.mean(axis=0)
    r = x - cents[crow]
    mn = r.min(axis=1)
    sc = np.maximum(r.max(axis=1) - mn, 1e-12) / 255.0
    codes = np.clip(np.round((r - mn[:, None]) / sc[:, None]), 0, 255
                    ).astype(np.uint8)
    xhat = cents[crow] + mn[:, None] + sc[:, None] * codes.astype(np.float32)
    sq = np.einsum("nd,nd->n", xhat, xhat).astype(np.float32)
    alive = np.ones(n, bool)
    alive[3:17] = False
    probe = np.stack([
        rng.choice(kc, size=min(5, kc), replace=False) for _ in range(b)
    ]).astype(np.int32)
    return x, q, crow, cents, codes, mn, sc, sq, xhat, alive, probe


def _sq8res_ref(q, xhat, sq, crow, alive, probe, k, metric):
    """Reference scores over the RECONSTRUCTION (the kernel's ground truth)."""
    dots = q @ xhat.T
    if metric == Metric.L2:
        scores = -np.maximum(
            (q * q).sum(1)[:, None] - 2 * dots + sq[None, :], 0)
    else:
        scores = dots
    member = np.stack([np.isin(crow, probe[bi]) for bi in range(len(q))])
    scores = np.where(member & alive[None, :], scores, -np.inf)
    return scores, np.argsort(-scores, axis=1)[:, :k]


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT])
def test_ivf_sq8_kernel_vs_numpy(metric):
    from pyrope_tpu.ops.pallas_scan import MASK_SENT, pallas_ivf_sq8_topk

    n, b, d, k, kc = 4096, 16, 32, 10, 24
    (x, q, crow, cents, codes, mn, sc, sq, xhat, alive,
     probe) = _sq8res_fixture(n, b, d, kc)
    kp = 128
    qc = q @ np.pad(cents, ((0, kp - kc), (0, 0))).T
    tq = np.full((b, kp), MASK_SENT, np.float32)
    tq[np.arange(b)[:, None], probe] = np.take_along_axis(qc, probe, axis=1)
    vals, idx = pallas_ivf_sq8_topk(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(mn), jnp.asarray(sc),
        jnp.asarray(sq), jnp.asarray(alive), jnp.asarray(crow),
        jnp.asarray(tq), k, metric,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    scores, ref_idx = _sq8res_ref(q, xhat, sq, crow, alive, probe, k, metric)
    for bi in range(b):
        assert set(idx[bi]) == set(ref_idx[bi])
    assert np.allclose(vals, np.take_along_axis(scores, idx, axis=1),
                       rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.INNER_PRODUCT])
def test_ivf_sq8_windowed_kernel_vs_numpy(metric):
    from pyrope_tpu.ops.pallas_scan import (
        MASK_SENT,
        pallas_ivf_sq8_topk_windowed,
        padded_probe_width,
        tile_cluster_windows,
    )

    n, b, d, k, kc = 16384, 16, 32, 10, 640  # kc > PALLAS_IVF_MAX_KPAD
    (x, q, crow, cents, codes, mn, sc, sq, xhat, alive,
     probe) = _sq8res_fixture(n, b, d, kc, seed=22)
    kp = padded_probe_width(kc)
    qc = q @ np.pad(cents, ((0, kp - kc), (0, 0))).T
    tq_t = np.full((kp, b), MASK_SENT, np.float32)
    tq_t[probe.T, np.arange(b)[None, :]] = np.take_along_axis(
        qc, probe, axis=1).T
    tile_clo, ok = tile_cluster_windows(crow, n, n, 4096, kpad=kp)
    assert ok
    vals, idx = pallas_ivf_sq8_topk_windowed(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(mn), jnp.asarray(sc),
        jnp.asarray(sq), jnp.asarray(alive), jnp.asarray(crow),
        jnp.asarray(tq_t), jnp.asarray(tile_clo), k, metric,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    scores, ref_idx = _sq8res_ref(q, xhat, sq, crow, alive, probe, k, metric)
    for bi in range(b):
        assert set(idx[bi]) == set(ref_idx[bi])
    assert np.allclose(vals, np.take_along_axis(scores, idx, axis=1),
                       rtol=1e-4, atol=1e-4)
