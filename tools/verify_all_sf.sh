#!/bin/bash
# Cross-SF correctness gate: run graft.Verify + the DuckDB compare at
# every generated scale factor. Expect three "FAILURES: 0" lines.
set -e
cd "$(dirname "$0")/.."
for sf in 0.001 0.01 0.1; do
  out="/tmp/verify_sf$sf"
  rm -rf "$out"
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out" > /dev/null 2>&1
  echo -n "sf$sf: "
  python3 tools/compare.py "/root/testdata/sf$sf" "$out" | tail -1
done
