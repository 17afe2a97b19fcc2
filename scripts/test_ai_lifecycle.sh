#!/usr/bin/env bash
# AI model lifecycle verification: train -> canary deploy -> rollback.
# Analog of the reference's scripts/test_ai_lifecycle.sh:1-64 (curl-driven
# against the running control plane + sidecar).
#
# Usage: start the stack first —
#   PYROPE_SIDECAR_PORT=50051 python -m pyrope_tpu.sidecar.server &
#   PYROPE_ADMIN_API_KEY=adm python -m pyrope_tpu.server --http-port 8080 --sidecar 127.0.0.1:50051 &
# then: ADMIN_KEY=adm scripts/test_ai_lifecycle.sh
set -euo pipefail

HOST="${PYROPE_HTTP:-http://127.0.0.1:8080}"
KEY="${ADMIN_KEY:?set ADMIN_KEY to the admin API key}"
H=(-H "X-API-KEY: ${KEY}" -H "Content-Type: application/json")

echo "== model status =="
curl -sf "${H[@]}" "${HOST}/v1/ai/models"; echo

echo "== trigger training =="
curl -sf -X POST "${H[@]}" "${HOST}/v1/ai/models/train"; echo
sleep 3

echo "== staged versions =="
STATUS=$(curl -sf "${H[@]}" "${HOST}/v1/ai/models")
echo "${STATUS}"
VERSION=$(echo "${STATUS}" | python -c "import sys,json; s=json.load(sys.stdin); print((s.get('staged') or [''])[-1])")
if [ -z "${VERSION}" ]; then
  echo "no staged model produced (decision log may be too small) — OK for a fresh stack"
  exit 0
fi

echo "== canary deploy ${VERSION} =="
curl -sf -X POST "${H[@]}" -d "{\"version\":\"${VERSION}\",\"canary_tenants\":[\"canary-t\"]}" \
  "${HOST}/v1/ai/models/deploy"; echo

echo "== evaluations =="
curl -sf "${H[@]}" "${HOST}/v1/ai/evaluations"; echo

echo "== rollback =="
curl -sf -X POST "${H[@]}" "${HOST}/v1/ai/models/rollback"; echo

echo "AI LIFECYCLE OK"
