#!/usr/bin/env bash
# Interleaved before/after A/B of one catalog query (the r12/r13 method):
# alternates RunOne blocks between two compiled-class snapshots so host-
# contention waves hit both sides. Each block is one JVM running the query
# --times N (run 1 absorbs codegen/JIT; judge on the warm runs' executor
# CPU + stage count, wall as secondary).
# Usage: tools/ab.sh <query> <beforeClasses> <afterClasses> [blocks=2] [times=3] [sf=/root/testdata/sf0.1]
set -euo pipefail
cd "$(dirname "$0")/.."
Q="$1"; BEFORE="$2"; AFTER="$3"; BLOCKS="${4:-2}"; TIMES="${5:-3}"; SF="${6:-/root/testdata/sf0.1}"
for i in $(seq 1 "$BLOCKS"); do
  echo "=== block $i BEFORE"
  GRAFT_CLASSES="$BEFORE" bash tools/run.sh graft.RunOne "$Q" "$SF" --times "$TIMES" 2>/dev/null | grep "^$Q"
  echo "=== block $i AFTER"
  GRAFT_CLASSES="$AFTER" bash tools/run.sh graft.RunOne "$Q" "$SF" --times "$TIMES" 2>/dev/null | grep "^$Q"
done
