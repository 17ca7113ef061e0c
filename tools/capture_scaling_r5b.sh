#!/usr/bin/env bash
# Round-5 graded-rule capture: interleaved 4c/16c pairs (N -> 4N), decoded
# and stored modes, each level its own JVM.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scaling_r5b.jsonl}
: > "$OUT"
run() { # cores mode
  echo "{\"start\":\"$(date -u +%H:%M:%S)\",\"cores\":$1,\"mode\":\"$2\"}" >> "$OUT"
  tools/run_tool.sh graft.tools.ScalingBench "$1" /root/testdata/sf0.1 1000 2 "$2" 2>/dev/null \
    | grep scaling_point >> "$OUT"
}
run 16 decoded
run 4  decoded
run 16 decoded
run 4  decoded
run 16 stored
run 4  stored
echo '{"done":true}' >> "$OUT"
