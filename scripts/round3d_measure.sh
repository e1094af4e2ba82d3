#!/bin/bash
# Round-3 batch d (after round3c): final tables under the lnq_fuse default.
#   1. variants all five published variants (final PERF_NOTES table)
#   2. knee     B/32 batch-knee re-sweep under the fused producers
#   3. latency  small-batch latency under the new engine default
set -u
cd "$(dirname "$0")/.."
mkdir -p .cache/round3
export JAX_COMPILATION_CACHE_DIR="$PWD/.cache/xla_bench"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)" | tee -a .cache/round3/driver_d.log
  timeout "$tmo" "$@" >.cache/round3/"$name".log 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S)" | tee -a .cache/round3/driver_d.log
}

run variants2 7200 python scripts/bench_variants.py
run knee384   1800 python scripts/bench_w8a8_model.py 384
run knee512   1800 python scripts/bench_w8a8_model.py 512
run latency2  2400 python scripts/bench_latency.py
run l336b64   1800 python scripts/bench_w8a8_model.py 64 ViT-L/14-336
run hlocyc    2400 python scripts/hlo_cycles.py --top 30
echo "ALL DONE (d) $(date +%H:%M:%S)" | tee -a .cache/round3/driver_d.log
