#!/usr/bin/env bash
# Builder-side bench artifact: run graft.Bench under the driver's
# protocol (local[32], sf0.1, 3-rep medians) with GRAFT_BENCH_OUT set,
# so BOTH emitted lines — the full record and the driver-parseable
# compact tail — are archived as BENCH_local_r{N}.json. Committed every
# round for the same reason local_correctness.sh exists: the official
# BENCH_r{1..6}.json artifacts carried zero parseable timings (the
# driver captures only the tail of stdout), so the perf gate needs a
# builder-side record that cannot rot.
#
# Usage: tools/local_bench.sh <round> [sf_dir] [cpus]
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: local_bench.sh <round> [sf_dir] [cpus]}"
SF_DIR="${2:-/root/testdata/sf0.1}"
CPUS="${3:-32}"
GRAFT_BENCH_OUT="BENCH_local_r${ROUND}.json" \
SPARK_GRAFT_SF_DIR="$SF_DIR" \
SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench"
echo "wrote BENCH_local_r${ROUND}.json"
