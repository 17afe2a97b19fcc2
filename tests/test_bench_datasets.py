"""Bench harness dataset plumbing: GloVe + fvecs paths (VERDICT r1 #9;
ref: src/Pyrope.Benchmarks/Program.cs:192-263 supports sift/glove/synthetic).
Runs the real bench run_config on a tiny corpus so CI exercises the CLI path
end-to-end on CPU."""

import numpy as np


def _write_glove(path, n=300, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        f.write("malformed_line_without_vector\n")  # tolerant-parse probe
        for i in range(n):
            vec = rng.normal(size=dim)
            f.write(f"tok{i} " + " ".join(f"{x:.5f}" for x in vec) + "\n")


def test_glove_reader_roundtrip(tmp_path):
    from pyrope_tpu.utils.datasets import read_fvecs, read_glove_txt, write_fvecs

    p = tmp_path / "glove.txt"
    _write_glove(str(p))
    tokens, vecs = read_glove_txt(str(p))
    assert len(tokens) == 300 and vecs.shape == (300, 16)
    fv = tmp_path / "glove.fvecs"
    write_fvecs(str(fv), vecs)
    back = read_fvecs(str(fv))
    np.testing.assert_allclose(back, vecs, rtol=1e-6)


def test_bench_run_config_on_glove_fvecs(tmp_path):
    """The --glove flow: glove txt -> fvecs -> run_config (smoke, CPU)."""
    import bench
    from pyrope_tpu.utils.datasets import read_glove_txt, write_fvecs

    p = tmp_path / "glove.txt"
    _write_glove(str(p), n=500, dim=16)
    _, vecs = read_glove_txt(str(p))
    fv = tmp_path / "glove.fvecs"
    write_fvecs(str(fv), vecs)

    out = bench.run_config(
        "flat1k", batch=8, topk=5, n_queries=8, duration_s=0.1,
        base_fvecs=str(fv), with_oracle=False,
    )
    assert out["n_base"] == 500 and out["dim"] == 16
    assert out["recall_at_k"] >= 0.99  # exact flat on the glove vectors


def test_zipf_cluster_sizes_and_generator():
    from pyrope_tpu.utils.datasets import (
        synthetic_zipf,
        synthetic_zipf_queries,
        zipf_cluster_sizes,
    )

    sizes = zipf_cluster_sizes(100_000, 100, alpha=1.0)
    assert sizes.sum() == 100_000 and (sizes > 0).all()
    # heavy tail: largest cluster ~ n/H(K) >> balanced n/K
    assert sizes.max() > 10 * (100_000 // 100)
    # deterministic
    np.testing.assert_array_equal(sizes, zipf_cluster_sizes(100_000, 100))

    base = synthetic_zipf(5000, 8, n_clusters=20)
    assert base.shape == (5000, 8) and base.dtype == np.float32
    np.testing.assert_array_equal(base, synthetic_zipf(5000, 8, n_clusters=20))
    q = synthetic_zipf_queries(64, 8, n_clusters=20)
    assert q.shape == (64, 8)


def test_zipf_bench_config_smoke():
    """ivf100k_zipf wiring at toy scale via the ZIPF branch (CPU)."""
    import bench

    bench.CONFIGS["_zipf_toy"] = ("IVF_FLAT", 3000, 16, {"nlist": 10})
    bench.ZIPF.add("_zipf_toy")
    try:
        out = bench.run_config("_zipf_toy", batch=8, topk=5, n_queries=8,
                               duration_s=0.1, with_oracle=False)
        assert out["n_base"] == 3000
        assert out["recall_at_k"] > 0.3  # skewed clusters, tiny nprobe
    finally:
        bench.CONFIGS.pop("_zipf_toy")
        bench.ZIPF.discard("_zipf_toy")
