"""Write on-disk dataset files for the file-backed bench rows.

SIFT1M/GloVe cannot be downloaded in this environment (no egress), so this
writes the clustered synthetic corpora to REAL files in the two formats the
reference's loaders read (ref: Datasets/FvecsReader.cs:14-58 int32-dim +
float32 LE records; Datasets/GloveTxtReader.cs:14-62 `token v1..vN` lines)
— proving the loader -> bench -> recall path end-to-end, not just the
readers' unit tests.

Usage:
    python scripts/make_dataset_files.py [outdir]   # default /tmp/pyrope_datasets
then:
    python bench.py --configs ivf100k_fvecs_file \
        --base-fvecs <outdir>/clustered100k.fvecs \
        --query-fvecs <outdir>/clustered100k_queries.fvecs
    python bench.py --configs ivf_glove_file --glove <outdir>/glove50k.txt
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyrope_tpu.utils.datasets import (  # noqa: E402
    synthetic_clustered,
    synthetic_clustered_queries,
    write_fvecs,
)


def write_glove_txt(path: Path, vecs: np.ndarray) -> None:
    """GloVe-format text: `token v1..vN` per line (6-decimal like the
    published GloVe files)."""
    with open(path, "w", encoding="utf-8") as f:
        for i, v in enumerate(vecs):
            f.write(f"w{i} " + " ".join(f"{x:.6f}" for x in v) + "\n")


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pyrope_datasets")
    out.mkdir(parents=True, exist_ok=True)

    base = synthetic_clustered(100_000, 128, n_clusters=100)
    queries = synthetic_clustered_queries(1024, 128, n_clusters=100)
    write_fvecs(out / "clustered100k.fvecs", base)
    write_fvecs(out / "clustered100k_queries.fvecs", queries)
    print(f"wrote {out}/clustered100k.fvecs "
          f"({(out / 'clustered100k.fvecs').stat().st_size / 2**20:.1f} MB)")

    # GloVe-style: 50k x 100-d (the published glove.6B.100d shape class)
    gbase = synthetic_clustered(50_000, 100, n_clusters=100)
    write_glove_txt(out / "glove50k.txt", gbase)
    gq = synthetic_clustered_queries(1024, 100, n_clusters=100)
    write_fvecs(out / "glove50k_queries.fvecs", gq)
    print(f"wrote {out}/glove50k.txt "
          f"({(out / 'glove50k.txt').stat().st_size / 2**20:.1f} MB)")


if __name__ == "__main__":
    main()
