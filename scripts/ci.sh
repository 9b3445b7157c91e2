#!/usr/bin/env bash
# Full test suite + summary artifact — run this in-round so the green
# baseline (round 1: 135 tests) can't silently regress.
#
# Usage: scripts/ci.sh [extra pytest args]
# Writes artifacts/ci_last.log (full output) and artifacts/ci_summary.txt.
# Takes ~20-25 min on the container CPU (the conftest forces an 8-device
# virtual CPU mesh; the tunneled TPU is never touched).
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts
start=$(date +%s)
python -m pytest tests/ -q -rs --durations=15 "$@" 2>&1 | tee artifacts/ci_last.log
rc=${PIPESTATUS[0]}
end=$(date +%s)
{
  date -u +"%Y-%m-%dT%H:%M:%SZ"
  echo "wall_seconds=$((end - start))"
  echo "rc=$rc"
  grep -E "passed|failed|error" artifacts/ci_last.log | tail -3
  # name every skip so a silently skipped parity test can't hide
  grep "^SKIPPED" artifacts/ci_last.log || true
} > artifacts/ci_summary.txt
cat artifacts/ci_summary.txt
exit $rc
