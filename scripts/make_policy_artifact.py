#!/usr/bin/env python
"""Regenerate the checked-in policy model artifact.

The reference ships a trained GBDT as ONNX in-repo
(`src/Pyrope.AISidecar/policy_model.onnx`, SURVEY §2.6). This script
produces the rebuild's equivalent deterministically: a seeded synthetic
decision log -> train_model.train() (GradientBoostingClassifier,
random_state=42) -> hand-rolled TreeEnsembleClassifier ONNX
(sidecar/onnx_emit.py), staged to pyrope_tpu/sidecar/policy_model.onnx.

Deterministic: seeded numpy log generation + seeded sklearn fit, so
re-running reproduces the committed bytes.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyrope_tpu.sidecar import train_model  # noqa: E402


def synth_log(path: Path, n: int = 400, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    with path.open("w") as f:
        for _ in range(n):
            m = {
                "qps": float(rng.uniform(10, 2000)),
                "cache_miss_rate": float(rng.uniform(0, 1)),
                "p99_latency_ms": float(rng.uniform(1, 120)),
                "cpu_utilization": float(rng.uniform(0, 1)),
            }
            f.write(json.dumps({"metrics": m}) + "\n")


def main() -> None:
    tmp = Path(tempfile.mkdtemp())
    log = tmp / "decisions.jsonl"
    synth_log(log)
    version = train_model.train(log, tmp, version="policy_model")
    src = tmp / f"{version}.onnx"
    dst = REPO / "pyrope_tpu" / "sidecar" / "policy_model.onnx"
    shutil.copyfile(src, dst)
    print(f"staged {dst} ({dst.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
