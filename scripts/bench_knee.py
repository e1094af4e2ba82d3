"""Batch-knee sweep of the DEFAULT engine path (one process, in-window).

The knee moves when the kernel mix changes (256 -> 448 -> 384 across rounds);
re-sweep after kernel work.  Usage: python scripts/bench_knee.py [variant]
[batch ...]
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

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "ViT-B/32"
BATCHES = [int(a) for a in sys.argv[2:]] or [320, 384, 416, 448, 512]
ITERS = 10


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} {VARIANT} batches={BATCHES}",
          flush=True)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    tag = VARIANT.replace("/", "-").replace("ViT", "vit").lower()
    path = os.path.join(cache, f"bench_{tag}_q4_0_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, VARIANT, ftype="q4_0", towers="vision")
    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    params = jax.device_put(_convert_layers_to_w8(
        load_params(reader, cfg, keep_quantized=True,
                    dtype=jnp.bfloat16))["vision"])
    size = cfg.vision.image_size
    rng = np.random.default_rng(0)

    fn = jax.jit(functools.partial(
        encode_image, cfg=cfg.vision, use_gelu=cfg.use_gelu, normalize=True,
        compute_dtype=jnp.bfloat16, lnq_fuse=True))

    results = {}
    for b in BATCHES:
        px = jax.device_put(jnp.asarray(
            rng.standard_normal((b, size, size, 3)), jnp.bfloat16))
        out = fn(params, pixels=px)
        float(jnp.sum(out))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(params, pixels=px)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / ITERS)
        dt = min(ts)
        results[b] = b / dt
        print(f"B={b:4d}  {dt * 1e3:7.2f} ms/step  {b / dt:8.0f} img/s",
              flush=True)
    best = max(results, key=results.get)
    print(f"knee: B={best} ({results[best]:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
