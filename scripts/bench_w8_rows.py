"""W8A8 vs fused-q4-Pallas vs dense GEMM across row counts (device-resident).

The round-3 latency A/B showed W8A8 losing ~28% to the fused q4 path at
B=16 (rows=800) while winning at B=448 (rows=22400) — and the serving
batcher lives exactly in that mid-rows regime (mean batch ~29 -> rows
~1450).  This maps the per-GEMM crossover so the engine can route by rows.

Paths at [rows, K] x [K, N] (CLIP MLP up shape by default):
  w8a8     per-row dynamic int8 activations x per-channel int8 weights
  q4pallas fused in-kernel dequant (packed HBM reads)
  q4xla    XLA dequantize-then-dot
  bf16     dense baseline

Run: python scripts/bench_w8_rows.py [N] [K]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_tpu.gguf.constants import GGMLType
from clip_tpu.ops.linear import qmatmul, w8a8_matmul
from clip_tpu.ops.qtensor import from_ggml_blocks, to_w8tensor, dequant_np
from clip_tpu.quant.formats import quantize as quantize_np
from clip_tpu.utils import enable_compile_cache

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
K = int(sys.argv[2]) if len(sys.argv) > 2 else 768
ROWS = (200, 800, 1600, 3200, 6400, 22400)
ITERS = 30


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} w=[{N},{K}]", flush=True)
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((N, K)) * 0.05).astype(np.float32)
    packed = quantize_np(w.reshape(-1, 32), GGMLType.Q4_0)
    qt = jax.device_put(from_ggml_blocks(packed.reshape(N, -1), (N, K), GGMLType.Q4_0))
    w8 = jax.device_put(to_w8tensor(qt))
    wd = jax.device_put(jnp.asarray(dequant_np(qt), jnp.bfloat16))

    paths = {
        "w8a8": lambda x: w8a8_matmul(x, w8, compute_dtype=jnp.bfloat16),
        "q4pallas": lambda x: qmatmul(x, qt, backend="pallas", compute_dtype=jnp.bfloat16),
        "q4xla": lambda x: qmatmul(x, qt, backend="xla", compute_dtype=jnp.bfloat16),
        "bf16": lambda x: jnp.matmul(x, wd.T, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
    }

    for rows in ROWS:
        xs = [jax.device_put(jnp.asarray(
            rng.standard_normal((rows, K)), jnp.bfloat16)) for _ in range(3)]
        line = [f"rows={rows:6d}"]
        for name, p in paths.items():
            fn = jax.jit(lambda x, p=p: jnp.max(jnp.abs(p(x))))
            try:
                float(fn(xs[0]))
                ts = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    acc = [fn(xs[i % 3]) for i in range(ITERS)]
                    jax.block_until_ready(acc)
                    ts.append((time.perf_counter() - t0) / ITERS)
                line.append(f"{name}={min(ts) * 1e3:7.3f}ms")
            except Exception as e:
                line.append(f"{name}=FAIL({type(e).__name__})")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
