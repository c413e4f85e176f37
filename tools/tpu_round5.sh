#!/bin/bash
# Round-5 hardware batch: refresh EVERY published config-4 number at
# the current defaults (VERDICT r4 next #2 — the stale-numbers hole)
# plus the per-stage breakdown. Run AFTER the defer A/B has decided
# the SWEEP_DEFER default. Usage:  bash tools/tpu_round5.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_r5}
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

run mesh_big  3600 python tools/ab_bigmesh.py mesh_big.txt --no-check --no-dense
run bunny     3600 python tools/ab_bigmesh.py bunny.txt --no-check --no-dense
run stream    3600 python tools/ab_bigmesh.py mesh_stream.txt --no-check --no-dense
run breakdown 5400 python tools/breakdown_bigmesh.py
echo "=== round-5 batch done ($(date)) ===" | tee -a "$LOG/summary.log"
