#!/usr/bin/env bash
# Round-7 graded-rule capture: interleaved 4c/16c pairs (N -> 4N),
# 16-core side first, each level its own JVM, identical 20M-page corpus
# (protocol: BENCH.md round-4/5 drift data — trust only same-window
# pairs). Stored and decoded get TWO same-window pairs each; encoded
# gets ONE (its replication lives in later windows / BENCH.md).
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scaling_r7.jsonl}
: > "$OUT"
run() { # cores mode
  echo "{\"start\":\"$(date -u +%H:%M:%S)\",\"cores\":$1,\"mode\":\"$2\"}" >> "$OUT"
  tools/run_tool.sh graft.tools.ScalingBench "$1" /root/testdata/sf0.1 1000 2 "$2" 2>/dev/null \
    | grep scaling_point >> "$OUT"
}
run 16 stored
run 4  stored
run 16 stored
run 4  stored
run 16 decoded
run 4  decoded
run 16 decoded
run 4  decoded
run 16 encoded
run 4  encoded
echo '{"done":true}' >> "$OUT"
