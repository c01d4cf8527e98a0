#!/bin/bash
# Cross-SF correctness gate: run graft.Verify + the DuckDB compare at
# every generated scale factor. Expect three "sf...: FAILURES: 0" lines;
# any sbt or compare failure exits nonzero with its log path printed.
set -eo pipefail
cd "$(dirname "$0")/.."
log=/tmp/verify_all_sf.log
rm -rf /tmp/verify_sf0.001 /tmp/verify_sf0.01 /tmp/verify_sf0.1
# one sbt JVM for all three Verify runs (startup paid once)
if ! sbt -batch \
    "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_sf0.001" \
    "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_sf0.01" \
    "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf0.1" \
    > "$log" 2>&1; then
  echo "Verify failed — see $log" >&2
  exit 1
fi
status=0
for sf in 0.001 0.01 0.1; do
  out="/tmp/verify_sf$sf"
  cmp="/tmp/compare_sf$sf.log"
  if python3 tools/compare.py "/root/testdata/sf$sf" "$out" > "$cmp" 2>&1 \
      && grep -q "^FAILURES: 0$" "$cmp"; then
    echo "sf$sf: FAILURES: 0"
  else
    echo "sf$sf: FAILED — see $cmp" >&2
    tail -5 "$cmp" >&2
    status=1
  fi
done
exit $status
