#!/bin/bash
# Round-4 hardware measurement batch (run the moment the tunnel is up).
# Order matters: perf measurements first; the XLA-mesh crash bisection
# is NOT here — it can wedge the worker for an hour (run it last,
# separately). Each step is bounded and logged; later steps still run
# if earlier ones fail. Usage:  bash tools/tpu_round4.sh [logdir]
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
  tail -4 "$LOG/$name.log" | tee -a "$LOG/summary.log"
}

# 1. Supernode-size sweep on mesh_big (the queued super-size A/B):
#    smaller supers shrink per-entry sweep work, grow the sorted stream.
run super_ab  5400 python tools/ab_bigmesh.py --super-ab
# 2. mesh_critter first-ever hardware numbers (correctness + dense +
#    sorted) — VERDICT item 7's measured fixture.
run critter   5400 python tools/ab_bigmesh.py mesh_critter.txt
# 3. bunny + mesh_stream at the current default sorted path (compacted
#    expansion) — BASELINE config_4 refresh.
run bunny     3600 python tools/ab_bigmesh.py bunny.txt --no-check --no-dense
run stream    3600 python tools/ab_bigmesh.py mesh_stream.txt --no-check --no-dense
# 4. mesh_big default confirm (the 41.2 number shipped from --radix-ab
#    runs; record it from the canonical path too).
run big       3600 python tools/ab_bigmesh.py mesh_big.txt --no-check --no-dense
# 5. Updated per-stage breakdown at the shipping config (floor proof
#    input: which stage dominates at 41 Mrays/s).
run breakdown 5400 python tools/breakdown_bigmesh.py
# 6. Headline bench (own watchdog).
run bench     3600 python bench.py
echo "=== round-4 batch done ($(date)) ===" | tee -a "$LOG/summary.log"
