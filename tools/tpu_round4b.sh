#!/bin/bash
# Round-4 hardware batch, part 2 (restart after the session crash —
# super_ab already landed: 512tris/E6=34.0, 512/E8=40.3, 256/E8=26.4
# vs 41.2 default => 1024-tri supers stay). Spill A/B leads: it
# decides whether SORT_SPILL ships this round.
# Usage:  bash tools/tpu_round4b.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_r4}
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

# 1. SORT_SPILL first-super + bounded-spill A/B (correctness + timed).
run spill_ab  5400 python tools/ab_bigmesh.py mesh_big.txt --spill-ab
# 2. mesh_critter first-ever hardware numbers (VERDICT item 7 fixture).
run critter   5400 python tools/ab_bigmesh.py mesh_critter.txt
# 3. bunny + mesh_stream at the shipping sorted path (config_4 refresh).
run bunny     3600 python tools/ab_bigmesh.py bunny.txt --no-check --no-dense
run stream    3600 python tools/ab_bigmesh.py mesh_stream.txt --no-check --no-dense
# 4. Updated per-stage breakdown at the shipping config.
run breakdown 5400 python tools/breakdown_bigmesh.py
# 5. Headline bench (own watchdog).
run bench     3600 python bench.py
echo "=== round-4b batch done ($(date)) ===" | tee -a "$LOG/summary.log"
