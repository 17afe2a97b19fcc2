#!/usr/bin/env bash
# Regenerate the protobuf message module from policy_service.proto
# (analog of the reference's src/Pyrope.AISidecar/codegen.py:6-28).
# The image has protoc but no grpc Python plugin: only *_pb2.py is generated;
# service registration is hand-rolled in pyrope_tpu/sidecar/server.py.
set -euo pipefail
cd "$(dirname "$0")/../pyrope_tpu/sidecar"
protoc --python_out=. policy_service.proto
echo "regenerated pyrope_tpu/sidecar/policy_service_pb2.py"
