#!/bin/bash
# Run the full queued TPU validation batch the moment the tunnel is
# back (round-3b outage left every TPU A/B pending — docs/ROUND3.md).
# Each step is bounded and logged; later steps still run if earlier
# ones fail. Usage:  bash tools/tpu_queue.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_queue}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date)) ===" | tee -a "$LOG/summary.log"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "$name rc=$rc" | tee -a "$LOG/summary.log"
  tail -3 "$LOG/$name.log" | tee -a "$LOG/summary.log"
}

# 1. Compile-smoke + golden image check of every bundled scene (the
#    new kernels from the outage block have never touched hardware).
run smoke     7200 python tools/smoke_pallas.py
# 2. Compaction-network hardware validation (mandatory after kernel work).
run compact   1800 python tools/tpu_validate_compaction.py
# 3. Texture A/B: in-kernel one-hot atlas fetch vs XLA shading.
run ab_tex    3600 python tools/ab_tex.py
# 4. Big-mesh A/B sweep: pair-expansion sorted stream vs dense K2.
run ab_big    5400 python tools/ab_bigmesh.py --sweep
# 5. Headline bench (has its own watchdog).
run bench     3600 python bench.py
echo "=== queue done ($(date)) ===" | tee -a "$LOG/summary.log"
