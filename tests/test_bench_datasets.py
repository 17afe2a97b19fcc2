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
