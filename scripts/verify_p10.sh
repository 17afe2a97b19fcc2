#!/usr/bin/env bash
# Index-quality sweep (analog of the reference's scripts/verify_p10.sh:1-74:
# IVF nlist sweep + HNSW comparison runs).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python scripts/sweep_indexes.py "$@"
