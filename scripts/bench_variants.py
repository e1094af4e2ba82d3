"""Throughput table across model variants (q4_0, bf16 compute, 1 chip).

Secondary benchmark backing docs/PERF_NOTES.md; the driver metric stays
bench.py's single ViT-B/32 line.  Usage: python scripts/bench_variants.py
[variant ...]; default runs all.
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

from clip_tpu.gguf import GGUFReader
from clip_tpu.models.config import ClipConfig
from clip_tpu.models.params import load_params
from clip_tpu.models.vision import encode_image
from clip_tpu.synth import make_synthetic_gguf
from clip_tpu.utils import enable_compile_cache

# per-variant throughput-knee batches (round-2 sweeps on v6e-class chip)
BATCHES = {
    "ViT-B/32": 384,  # ragged re-sweep: divides the 256-row gemm_gq blocks
    "ViT-B/16": 192,
    "ViT-L/14": 192,  # round-3 re-sweep: 977 vs 960 at 128 (in-window)
    "ViT-L/14-336": 32,
    "ViT-H/14": 32,
}
ITERS = 20


def bench(variant: str) -> tuple[float, float]:
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    tag = variant.replace("/", "-").replace("ViT", "vit").lower()
    path = os.path.join(cache, f"bench_{tag}_q4_0_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, variant, ftype="q4_0", towers="vision")
    from clip_tpu.engine import _convert_layers_to_w8

    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    # W8A8 int8 compute: the engine's TPU default (round-3)
    params = jax.device_put(_convert_layers_to_w8(
        load_params(reader, cfg, keep_quantized=True, dtype=jnp.bfloat16))["vision"])
    b = BATCHES[variant]
    host_px = (np.random.default_rng(0).normal(
        size=(b, cfg.vision.image_size, cfg.vision.image_size, 3))
        .astype(np.float32).astype(jnp.bfloat16))  # host-staged, bit-identical

    # scan (the engine default): with W8A8, scan beat unroll on B/32 (31.1 vs
    # 32.6 ms) and each unroll compile costs minutes through the relay
    def model(params, pixels):
        return encode_image(
            params, cfg.vision, pixels, use_gelu=cfg.use_gelu,
            normalize=True, compute_dtype=jnp.bfloat16,
            # fused producers: with the gemm_gq epilogue the fused path wins
            # at every vision width (engine.lnq_fuse auto rule) — mirror the engine
            lnq_fuse=jax.default_backend() == "tpu")

    if jax.default_backend() == "tpu":
        # layout-staged pixels, mirroring engine._LayoutAwareJit / bench.py
        from clip_tpu.engine import aot_layout_staged

        fn, (px,) = aot_layout_staged(model, params, host_px)
    else:
        fn = jax.jit(model)
        px = jax.device_put(host_px)
    out = fn(params, px)
    float(jnp.sum(out))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(params, px)
        float(jnp.sum(out))
        ts.append((time.perf_counter() - t0) / ITERS)
    ms = min(ts) * 1e3
    return ms, b / min(ts)


def main():
    enable_compile_cache()
    variants = sys.argv[1:] or list(BATCHES)
    print(f"| variant | batch | ms/step | images/s/chip |")
    print(f"|---|---|---|---|")
    for v in variants:
        batch = BATCHES.get(v, "?")
        try:
            ms, ips = bench(v)
            print(f"| {v} | {batch} | {ms:.1f} | {ips:,.0f} |", flush=True)
        except Exception as e:
            print(f"| {v} | {batch} | FAILED {type(e).__name__} | |", flush=True)
            print(f"    {str(e)[:400]}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
