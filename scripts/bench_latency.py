"""Single-image latency A/B: W8A8 vs the fused q4 Pallas path.

W8A8 (the round-3 TPU default) wins throughput shapes on int8-MXU compute,
but at M=1 every matmul is HBM-bound on WEIGHT bytes — and per-channel int8
codes are 1 byte/elt vs packed q4_0's 0.5625, so the fused dequant kernel
reads ~1.8x less.  If W8A8 loses here, the engine should keep act_quant
auto-on only for throughput use and the latency CLIs should pass
--no-act-quant (or the engine should gate on batch size).

Run: python scripts/bench_latency.py [batches ...]   (default 1 4 16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_tpu.utils import enable_compile_cache

BATCHES = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
ITERS = 50


def main():
    enable_compile_cache()
    import jax
    import numpy as np

    from clip_tpu.engine import ClipEngine
    from clip_tpu.synth import make_synthetic_gguf

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, "bench_vit-b-32_q4_0_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, "ViT-B/32", ftype="q4_0", towers="vision")

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    for act_quant in (False, True):
        eng = ClipEngine(path, verbosity=0, act_quant=act_quant)
        name = "w8a8" if act_quant else "q4-fused"
        for b in BATCHES:
            px = rng.normal(size=(b, 224, 224, 3)).astype(np.float32)
            eng.encode_image(px, normalize=True, preprocessed=True)  # compile
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    out = eng.encode_image(px, normalize=True, preprocessed=True)
                ts.append((time.perf_counter() - t0) / ITERS)
            ms = min(ts) * 1e3
            print(f"{name:9s} B={b:3d}  {ms:7.3f} ms/encode", flush=True)
        eng.close()


if __name__ == "__main__":
    main()
