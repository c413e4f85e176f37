#!/bin/bash
# Round-4 hardware batch, part 3: the steps part 2 lost to a
# concurrent source edit (lesson: never edit imported source while a
# batch is running). Usage:  bash tools/tpu_round4c.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_r4c}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date)) ===" | tee -a "$LOG/summary.log"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "$name rc=$rc" | tee -a "$LOG/summary.log"
  tail -6 "$LOG/$name.log" | tee -a "$LOG/summary.log"
}

run bunny     3600 python tools/ab_bigmesh.py bunny.txt --no-check --no-dense
run stream    3600 python tools/ab_bigmesh.py mesh_stream.txt --no-check --no-dense
run breakdown 5400 python tools/breakdown_bigmesh.py
echo "=== round-4c batch done ($(date)) ===" | tee -a "$LOG/summary.log"
