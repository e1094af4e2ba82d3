#!/bin/bash
# Round-3 follow-up measurement batch (run AFTER round3_measure.sh):
#   1. text     re-run the fixed text-tower A/B (n_vocab attr bug)
#   2. lnqmodel in-model A/B of the fused LN/gelu->int8-quant producers
#               (decides the engine's lnq_fuse default)
#   3. h14      re-run with the W8 flat-path gate live (q5_1 checkpoint)
#   4. q5rows   q5 pallas-vs-XLA GEMM across row counts (decides _resolve
#               routing for packed5 at rows > 2048)
set -u
cd "$(dirname "$0")/.."
mkdir -p .cache/round3
export JAX_COMPILATION_CACHE_DIR="$PWD/.cache/xla_bench"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)" | tee -a .cache/round3/driver_b.log
  timeout "$tmo" "$@" >.cache/round3/"$name".log 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S)" | tee -a .cache/round3/driver_b.log
}

run w8rows   3600 python scripts/bench_w8_rows.py
run text     2400 python scripts/bench_text.py 256
run lnqmodel 3600 python scripts/bench_w8a8_model.py 448
run h14b     5400 python scripts/bench_h14.py 32
run q5rows   2400 python scripts/bench_q5_rows.py
run lnqproto 2400 python scripts/proto_lnq_kernel.py
echo "ALL DONE (b) $(date +%H:%M:%S)" | tee -a .cache/round3/driver_b.log
