#!/usr/bin/env bash
# Builder-side plan-shape inventory: execute every registered query at
# sf0.001 and record final-adaptive-plan node counts (exchanges, join
# strategies, cartesian, codegen spans) as PLAN_AUDIT_r{N}.json — the
# machine-checked form of SURVEY §2.11's shuffle inventory. Committed
# each round so a plan-shape regression shows up in the artifact diff.
#
# Usage: tools/local_plan_audit.sh <round> [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: local_plan_audit.sh <round> [sf_dir]}"
SF_DIR="${2:-/root/testdata/sf0.001}"
sbt -batch "runMain graft.PlanAudit $SF_DIR PLAN_AUDIT_r${ROUND}.json"
echo "wrote PLAN_AUDIT_r${ROUND}.json"
