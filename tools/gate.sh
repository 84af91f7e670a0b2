#!/usr/bin/env bash
# The complete local correctness gate, in one command:
#   bash tools/gate.sh [sfDir ...]
# Defaults to the dual-SF gate (sf0.01 + sf0.1). For each SF: full
# graft.Verify dump, then BOTH comparators — strict_check.py (exact
# arithmetic, no float tolerance) and driver_check.py (driver-faithful
# pandas representation: sort_values over all columns, dtype round-trip,
# row hash). A query must be green under both. Run `sbt test` separately
# for the spec suite.
set -euo pipefail
cd "$(dirname "$0")/.."
SFS=("${@:-/root/testdata/sf0.01 /root/testdata/sf0.1}")
[ $# -eq 0 ] && SFS=(/root/testdata/sf0.01 /root/testdata/sf0.1)
rc=0
for sf in "${SFS[@]}"; do
  out="/tmp/gate_$(basename "$sf")"
  echo "== Verify $sf -> $out"
  sbt -batch "runMain graft.Verify $sf $out" 2>&1 | grep -E '\[verify\]' || true
  python3 tools/strict_check.py "$sf" "$out" || rc=1
  python3 tools/driver_check.py "$sf" "$out" | tail -1 || rc=1
done
exit $rc
