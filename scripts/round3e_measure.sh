#!/bin/bash
# Round-3 batch e (after round3d): serving-path attribution + cache reseed.
#   1-3. serve A/B: default (W8A8+lnq) vs --no-act-quant vs default again —
#        attributes the image req/s drift (59.5 r2 -> 42 -> 29) to engine
#        path vs relay-environment drift
#   4.   reseed the committed XLA cache for the driver's programs
set -u
cd "$(dirname "$0")/.."
mkdir -p .cache/round3
export JAX_COMPILATION_CACHE_DIR="$PWD/.cache/xla_bench"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)" | tee -a .cache/round3/driver_e.log
  timeout "$tmo" "$@" >.cache/round3/"$name".log 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S)" | tee -a .cache/round3/driver_e.log
}

run variants3 7200 python scripts/bench_variants.py
run text2     2400 python scripts/bench_text.py 256
run srv_w8a   3600 python scripts/serve_loadtest.py
run srv_noaq  3600 python scripts/serve_loadtest.py --server-args --no-act-quant
run srv_w8b   3600 python scripts/serve_loadtest.py
unset JAX_COMPILATION_CACHE_DIR
run reseed    7200 bash scripts/reseed_compile_cache.sh
echo "ALL DONE (e) $(date +%H:%M:%S)" | tee -a .cache/round3/driver_e.log
