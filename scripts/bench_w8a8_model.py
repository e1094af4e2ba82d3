"""In-model A/B: W8A8 activation-quantized compute vs the bf16 dequant path.

Times the full q4_0 ViT-B/32 vision encode (bench.py protocol shapes) with:
  q4_bf16   current path (dequant folded into bf16 GEMMs)
  q4_w8a8   per-channel int8 weights + per-row int8 activations (int8 MXU)
  w8+lnq    W8A8 + fused Pallas LN/gelu->int8-quant producers
            (ops.actquant_pallas; the round-3 lnq_fuse knob)
  dense     dense bf16 weights (the round-2 'quantized should beat this' bar)

Run: python scripts/bench_w8a8_model.py [batch] [variant]
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 448
VARIANT = sys.argv[2] if len(sys.argv) > 2 else "ViT-B/32"
ITERS = 10


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} B={BATCH} {VARIANT}", flush=True)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    tag = VARIANT.replace("/", "-").replace("ViT", "vit").lower()
    path = os.path.join(cache, f"bench_{tag}_q4_0_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, VARIANT, ftype="q4_0", towers="vision")

    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    pq = load_params(reader, cfg, keep_quantized=True, dtype=jnp.bfloat16)
    pw8 = _convert_layers_to_w8(pq)
    pdense = load_params(reader, cfg, keep_quantized=False, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    pixels = jax.device_put(jnp.asarray(
        rng.standard_normal((BATCH, size, size, 3)), jnp.bfloat16))

    def run_one(name, params, **kw):
        params = jax.device_put(params["vision"])
        fn = jax.jit(functools.partial(
            encode_image, cfg=cfg.vision, use_gelu=cfg.use_gelu,
            normalize=True, compute_dtype=jnp.bfloat16, **kw))
        out = fn(params, pixels=pixels)
        float(jnp.sum(out))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(params, pixels=pixels)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / ITERS)
        dt = min(ts)
        print(f"{name:9s}  {dt * 1e3:7.2f} ms/step  {BATCH / dt:8.0f} img/s",
              flush=True)
        del params
        return dt

    # arm that reverts the fused up-GEMM epilogue to the round-3 unfused
    # pair (int8 dot -> bf16 -> actq_pallas), for in-window attribution of
    # gemm_gq_pallas specifically
    from clip_tpu.models import transformer as tmod
    from clip_tpu.ops.actquant_pallas import actq_pallas, w8a8_pre
    from clip_tpu.ops.qtensor import W8Tensor

    real_gemm_gq = tmod.gemm_gq_pallas

    def unfused_pair(codes, sx, c8, ws, bias, *, act, interpret=False):
        w = W8Tensor(c8=c8, ws=ws, qtype="w8")
        h = w8a8_pre(codes, sx, w, jnp.bfloat16) + bias.astype(jnp.bfloat16)
        return actq_pallas(h, act=act, interpret=interpret)

    def run_lnq_pair(name, params):
        tmod.gemm_gq_pallas = unfused_pair
        try:
            return run_one(name, params, lnq_fuse=True)
        finally:
            tmod.gemm_gq_pallas = real_gemm_gq

    run_one("q4_bf16", pq)
    run_one("q4_w8a8", pw8)
    run_lnq_pair("lnq_pair", pw8)
    run_one("lnq_gemm", pw8, lnq_fuse=True, mlp_full=False, attn_i8=False,
            attn_block=False)
    run_one("lnq_mlp", pw8, lnq_fuse=True, attn_block=False)  # r4 whole-MLP
    run_one("lnq_ablk", pw8, lnq_fuse=True)  # r4/r5 default (incl. mlp_stream)
    run_one("no_stream", pw8, lnq_fuse=True, mlp_stream=False)  # r4 behavior
    run_one("up_gq", pw8, up_gq=True, mlp_full=False)
    run_one("upgq_mlp", pw8, up_gq=True)     # codes-in whole-MLP kernel
    run_one("dense", pdense)
    run_one("lnq_ablkb", pw8, lnq_fuse=True)  # drift check


if __name__ == "__main__":
    main()
