#!/usr/bin/env bash
# The complete local correctness gate, in one command:
#   bash tools/gate.sh [sfDir ...]
# Defaults to the dual-SF gate (sf0.01 + sf0.1). For each SF: full
# graft.Verify dump into a FRESH directory (stale dumps can't pass for
# the current tree), then BOTH comparators — strict_check.py (exact
# arithmetic, no float tolerance; exits nonzero on any bad row) and
# driver_check.py (driver-faithful pandas representation: sort_values
# over all columns, dtype round-trip, row hash). A query must be green
# under both. Run `sbt test` separately for the spec suite.
set -uo pipefail
cd "$(dirname "$0")/.."
SFS=("$@")
[ $# -eq 0 ] && SFS=(/root/testdata/sf0.01 /root/testdata/sf0.1)
rc=0
for sf in "${SFS[@]}"; do
  out="/tmp/gate_$(basename "$sf")"
  echo "== Verify $sf -> $out"
  rm -rf "$out"
  log="/tmp/gate_verify_$(basename "$sf").log"
  if ! sbt -batch "runMain graft.Verify $sf $out" >"$log" 2>&1; then
    echo "VERIFY FAILED (sbt exit != 0) — tail of $log:"
    tail -20 "$log"
    rc=1
    continue
  fi
  grep -E '\[verify\]' "$log" && rc=1  # per-query failures, if any
  python3 tools/strict_check.py "$sf" "$out" || rc=1
  python3 tools/driver_check.py "$sf" "$out" || rc=1
done
exit $rc
