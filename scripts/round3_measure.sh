#!/bin/bash
# Round-3 unattended measurement batch: run every TPU measurement the round
# still needs, back to back, logging to .cache/round3/*.log.  Designed to be
# started once the axon relay is reachable and left alone — each stage is
# independently time-boxed so one wedged compile can't eat the session.
#
# Stages (order matters: cheapest/most-valuable first so partial runs pay off):
#   1. headline  bench.py (seeded cache: ~1 min warm)
#   2. text      text-tower W8A8 A/B (scripts/bench_text.py)
#   3. h14       ViT-H/14 attack (scripts/bench_h14.py) — new int8 GEMM shapes,
#                first compiles are minutes each through the relay
#   4. variants  all-variant table under W8A8 (scripts/bench_variants.py)
set -u
cd "$(dirname "$0")/.."
mkdir -p .cache/round3
# all stages share the COMMITTED persistent cache so the relay's int8-GEMM
# autotune pathology (2-7 min per new GEMM shape) is paid once, then carried
# by the repo for the driver's bench and future rounds
export JAX_COMPILATION_CACHE_DIR="$PWD/.cache/xla_bench"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)" | tee -a .cache/round3/driver.log
  timeout "$tmo" "$@" >.cache/round3/"$name".log 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S)" | tee -a .cache/round3/driver.log
}

run headline 1200 python bench.py
# seed the committed cache with the DRIVER's entry-point shapes (B=4 W8A8
# GEMMs are distinct shapes from the B=448 bench ones)
run entryseed 2400 python -c "import __graft_entry__ as g, jax; fn, a = g.entry(); jax.jit(fn).lower(*a).compile(); print('entry compile OK')"
run text     2400 python scripts/bench_text.py 256
run h14      5400 python scripts/bench_h14.py 32
run variants 5400 python scripts/bench_variants.py
run serving  3600 python scripts/serve_loadtest.py
run latency  2400 python scripts/bench_latency.py
run lnq      2400 python scripts/proto_lnq_kernel.py
echo "ALL DONE $(date +%H:%M:%S)" | tee -a .cache/round3/driver.log
