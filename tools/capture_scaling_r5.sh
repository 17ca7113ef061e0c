#!/usr/bin/env bash
# Round-5 scaling capture: interleaved 8c/32c pairs in stored and decoded
# modes (VERDICT_r04 ask #5 — replicate the 8->32 >=0.8 pair, and give the
# stored mode its first clean window). Interleaving is the protocol from
# BENCH.md: mode/level comparisons are only trusted when the paired runs
# share the same box window.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scaling_r5.jsonl}
: > "$OUT"
run() { # cores mode
  echo "{\"start\":\"$(date -u +%H:%M:%S)\",\"cores\":$1,\"mode\":\"$2\"}" >> "$OUT"
  tools/run_tool.sh graft.tools.ScalingBench "$1" /root/testdata/sf0.1 1000 2 "$2" 2>/dev/null \
    | grep scaling_point >> "$OUT"
}
# stored first (the north rule's job shape); 32c first materializes the table
run 32 stored
run 8  stored
run 32 stored
run 8  stored
run 32 decoded
run 8  decoded
run 32 decoded
run 8  decoded
echo '{"done":true}' >> "$OUT"
