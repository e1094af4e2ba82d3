"""q5 fused-Pallas vs XLA-dequant GEMM at LARGE row counts.

ops.linear._resolve routes rows > _PALLAS_MAX_ROWS (2048) to the XLA
dequantize-then-dot path — a rule measured on q4_0, whose dequant is a cheap
nibble unpack.  q5_0/q5_1 add the fifth-bit plane: XLA's lowering of the
unpack (interleave relayout + 8x repeat + shifts) is catastrophic in-model
(ViT-H/14 q5_1 B=32 measured 16 img/s vs 433 under W8A8 —
scripts/bench_h14.py round 3).  This isolates the per-GEMM cost: fused
Pallas (packed HBM reads, in-kernel bit-plane expansion) vs XLA dequant at
H/14's up-projection shape across row counts straddling the 2048 gate.

Run: python scripts/bench_q5_rows.py [qtype] [N] [K]
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
from clip_tpu.ops.linear import qmatmul
from clip_tpu.ops.qtensor import from_ggml_blocks
from clip_tpu.quant.formats import quantize as quantize_np
from clip_tpu.utils import enable_compile_cache

QTYPE = getattr(GGMLType, (sys.argv[1] if len(sys.argv) > 1 else "q5_1").upper())
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5120
K = int(sys.argv[3]) if len(sys.argv) > 3 else 1280
ROWS = (512, 2048, 8224, 22400)
ITERS = 20


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} {QTYPE.name} w=[{N},{K}]", flush=True)
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((N, K)) * 0.05).astype(np.float32)
    packed = quantize_np(w.reshape(-1, 32), QTYPE)
    qt = jax.device_put(from_ggml_blocks(packed.reshape(N, -1), (N, K), QTYPE))

    for rows in ROWS:
        xs = [jax.device_put(jnp.asarray(
            rng.standard_normal((rows, K)), jnp.bfloat16)) for _ in range(3)]
        for backend in ("pallas", "xla"):
            fn = jax.jit(lambda x, b=backend: jnp.max(jnp.abs(
                qmatmul(x, qt, backend=b, compute_dtype=jnp.bfloat16))))
            try:
                float(fn(xs[0]))
                ts = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    acc = [fn(xs[i % 3]) for i in range(ITERS)]
                    jax.block_until_ready(acc)
                    ts.append((time.perf_counter() - t0) / ITERS)
                ms = min(ts) * 1e3
                tf = 2 * rows * N * K / (min(ts) * 1e12)
                print(f"rows={rows:6d} {backend:7s} {ms:8.3f} ms  {tf:6.1f} TF/s",
                      flush=True)
            except Exception as e:
                print(f"rows={rows:6d} {backend:7s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
