"""scan vs unroll re-race under the current kernel mix (in-window A/B).

Round 2 measured scan FASTER than unroll (31.1 vs 32.6 ms at B=448 W8A8)
and bench.py kept scan.  The per-layer path is now two Pallas block kernels
with folded residuals; proto_layer_kernel's slope (distinct buffers = de
facto unroll) at 1.333 ms/layer x 12 = 16.0 ms vs the 20.4 ms in-model step
suggests the scan's stacked-weight dynamic slices may now cost real time.

Run: python scripts/bench_scan_vs_unroll.py [batch] [variant]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_tpu.engine import _convert_layers_to_w8
from clip_tpu.gguf import GGUFReader
from clip_tpu.models.config import ClipConfig
from clip_tpu.models.params import load_params
from clip_tpu.models.vision import encode_image
from clip_tpu.synth import make_synthetic_gguf
from clip_tpu.utils import enable_compile_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 384
VARIANT = sys.argv[2] if len(sys.argv) > 2 else "ViT-B/32"
ITERS = 10


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} B={BATCH} {VARIANT}", flush=True)
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    tag = VARIANT.replace("/", "-").replace("ViT", "vit").lower()
    path = os.path.join(cache, f"bench_{tag}_q4_0_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, VARIANT, ftype="q4_0", towers="vision")

    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    pw8 = jax.device_put(_convert_layers_to_w8(
        load_params(reader, cfg, keep_quantized=True,
                    dtype=jnp.bfloat16))["vision"])

    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    pixels = jax.device_put(jnp.asarray(
        rng.standard_normal((BATCH, size, size, 3)), jnp.bfloat16))

    def run_one(name, **kw):
        fn = jax.jit(functools.partial(
            encode_image, cfg=cfg.vision, use_gelu=cfg.use_gelu,
            normalize=True, compute_dtype=jnp.bfloat16, lnq_fuse=True, **kw))
        t0 = time.perf_counter()
        out = fn(pw8, pixels=pixels)
        float(jnp.sum(out))
        print(f"{name:8s}  compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(pw8, pixels=pixels)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / ITERS)
        dt = min(ts)
        print(f"{name:8s}  {dt * 1e3:7.2f} ms/step  {BATCH / dt:8.0f} img/s",
              flush=True)
        return dt

    run_one("scan")
    run_one("unroll", unroll=True)
    run_one("scan_b")  # drift check


if __name__ == "__main__":
    main()
