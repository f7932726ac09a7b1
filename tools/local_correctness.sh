#!/usr/bin/env bash
# Builder-side correctness gate: run graft.Verify at sf0.01 and the
# DuckDB compare, writing CORRECTNESS_local_r{N}.json in the driver's
# per-query format. Committed every round so the correctness signal
# survives a driver artifact-pipeline failure (round 5: the driver's
# CORRECTNESS_r05.json came back empty and r03/r04 were stale).
#
# Usage: tools/local_correctness.sh <round> [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: local_correctness.sh <round> [sf_dir]}"
SF_DIR="${2:-/root/testdata/sf0.01}"
OUT_DIR="target/verify-local"
rm -rf "$OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
python3 tools/compare_oracle.py "$OUT_DIR" "$SF_DIR" \
  "CORRECTNESS_local_r${ROUND}.json"
