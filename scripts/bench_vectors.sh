#!/usr/bin/env bash
# Bench CLI wrapper (analog of the reference's scripts/bench_vectors.sh:1-10,
# which wraps `dotnet run --project src/Pyrope.Benchmarks`).
# Usage: scripts/bench_vectors.sh [--config ivf100k] [--batch 64] [...]
set -euo pipefail
cd "$(dirname "$0")/.."
exec python bench.py "$@"
