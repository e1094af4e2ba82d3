#!/bin/bash
# Round-3 batch c (run AFTER round3b): re-measure with lnq_fuse as the
# TPU default.
#   1. headline  bench.py with fused producers (expect ~15.7k img/s)
#   2. entryseed re-seed the committed cache for the driver's entry shapes
#   3. tpusuite  hardware test run (accuracy gate must hold with lnq on)
#   4. serving   load test under the new default
set -u
cd "$(dirname "$0")/.."
mkdir -p .cache/round3
export JAX_COMPILATION_CACHE_DIR="$PWD/.cache/xla_bench"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)" | tee -a .cache/round3/driver_c.log
  timeout "$tmo" "$@" >.cache/round3/"$name".log 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S)" | tee -a .cache/round3/driver_c.log
}

run headline2  2400 python bench.py
run entryseed2 2400 python -c "import __graft_entry__ as g, jax; fn, a = g.entry(); jax.jit(fn).lower(*a).compile(); print('entry compile OK')"
CLIP_TPU_TEST_TPU=1 run tpusuite 3600 python -m pytest tests/test_attention_pallas.py tests/test_actquant_fusion.py tests/test_w8a8.py tests/test_models.py tests/test_accuracy_gate.py -q
run serving2   3600 python scripts/serve_loadtest.py
echo "ALL DONE (c) $(date +%H:%M:%S)" | tee -a .cache/round3/driver_c.log
