#!/usr/bin/env bash
# Quality gate (analog of the reference's scripts/check_quality.sh:1-54:
# format + build + test + lint + vuln scan, mapped to this stack).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 byte-compile every module =="
python -m compileall -q pyrope_tpu tests bench.py __graft_entry__.py

echo "== 2/4 import + native toolchain check =="
python - <<'EOF'
import pyrope_tpu
from pyrope_tpu.native import native_available
print("package import ok; native builder:", "available" if native_available() else "UNAVAILABLE (python fallback)")
EOF

echo "== 3/4 lint (pyflakes via pytest's bundled py/flake if present) =="
if python -c "import pyflakes" 2>/dev/null; then
  python -m pyflakes pyrope_tpu bench.py __graft_entry__.py || exit 1
else
  echo "pyflakes not installed; skipping lint"
fi

echo "== 4/4 test suite =="
python -m pytest tests/ -x -q

echo "ALL QUALITY CHECKS PASSED"
