#!/usr/bin/env bash
# Dev mTLS material: CA + server/client certs for the engine<->sidecar gRPC
# channel (analog of the reference's scripts/generate_mtls_certs.sh).
# Output: certs/{ca,server,client}.{crt,key}
set -euo pipefail
OUT="${1:-certs}"
mkdir -p "${OUT}"
cd "${OUT}"

openssl req -x509 -newkey rsa:2048 -nodes -days 365 \
  -keyout ca.key -out ca.crt -subj "/CN=pyrope-dev-ca" 2>/dev/null

for role in server client; do
  openssl req -newkey rsa:2048 -nodes \
    -keyout "${role}.key" -out "${role}.csr" -subj "/CN=pyrope-${role}" 2>/dev/null
  openssl x509 -req -in "${role}.csr" -CA ca.crt -CAkey ca.key -CAcreateserial \
    -days 365 -out "${role}.crt" \
    -extfile <(printf "subjectAltName=DNS:localhost,IP:127.0.0.1") 2>/dev/null
  rm -f "${role}.csr"
done
rm -f ca.srl

cat <<EOF
Generated in ${OUT}/:
  sidecar server env:
    PYROPE_SIDECAR_MTLS_CERT=${OUT}/server.crt
    PYROPE_SIDECAR_MTLS_KEY=${OUT}/server.key
    PYROPE_SIDECAR_MTLS_CA=${OUT}/ca.crt
  engine client env:
    PYROPE_SIDECAR_CLIENT_CA=${OUT}/ca.crt
    PYROPE_SIDECAR_CLIENT_CERT=${OUT}/client.crt
    PYROPE_SIDECAR_CLIENT_KEY=${OUT}/client.key
EOF
