#!/bin/bash
# Regenerate the MINIMAL committed XLA compile-cache seed.
#
# The repo commits exactly the cache entries the driver's two entry points
# need (bench.py + __graft_entry__.entry), so a fresh environment pays ~10 s
# instead of the relay's ~27-min int8-GEMM autotune (docs/PERF_NOTES.md).
# Everything else accumulated in .cache/xla_bench during measurement
# sessions stays local/untracked.
#
# Method: cold-compile ONLY those two programs into an empty scratch dir
# (this pays the full autotune once — run it when the TPU is otherwise
# idle), then swap the committed set for the scratch contents.
set -eu
cd "$(dirname "$0")/.."

SEED="$PWD/.cache/xla_seed"
rm -rf "$SEED"; mkdir -p "$SEED"

echo "=== cold-compiling bench.py program into seed ($(date +%H:%M:%S))"
JAX_COMPILATION_CACHE_DIR="$SEED" timeout 3600 python bench.py >/dev/null || exit 1
echo "=== cold-compiling driver entry into seed ($(date +%H:%M:%S))"
JAX_COMPILATION_CACHE_DIR="$SEED" timeout 3600 python -c \
  "import __graft_entry__ as g, jax; fn, a = g.entry(); jax.jit(fn).lower(*a).compile(); print('entry OK')" || exit 1

echo "=== swapping committed seed ($(du -sh "$SEED" | cut -f1))"
git rm -r -q --cached .cache/xla_bench 2>/dev/null || true
cp -f "$SEED"/* .cache/xla_bench/
for f in "$SEED"/*; do git add -f ".cache/xla_bench/$(basename "$f")"; done
echo "=== staged $(ls "$SEED" | wc -l) entries; commit with:"
echo "    git commit -m 'Reseed committed XLA cache for the fused-producer programs'"
