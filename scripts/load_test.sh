#!/usr/bin/env bash
# SLO compliance matrix (analog of the reference's scripts/load_test.sh:1-147).
# Env: SLO_P99_MS (default 50).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python scripts/load_test.py "$@"
