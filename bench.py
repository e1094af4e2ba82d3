"""Headline benchmark: q4_0 ViT-B/32 vision-encode throughput per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Protocol
--------
* synthetic q4_0 ViT-B/32 vision-only GGUF (random weights — zero-egress env;
  identical shapes/compute to the real checkpoint),
* quantized weights resident in HBM, bf16 compute, batch 640 (re-swept
  256-1280 after the round-5 kernel work; the curve plateaus 640-1280),
* steady-state: 2 warmup rounds then median of 5 timed rounds of 10 encodes;
  each round ends with a host readback of a scalar reduction (the axon relay's
  block_until_ready is unreliable for full sync, so readback is the barrier).

Baseline
--------
BASELINE.json publishes no reference numbers and the reference cannot be
built here (its ggml submodule isn't checked out).  We anchor against
20 images/s — a *generous* estimate for clip.cpp's q4_0 ViT-B/32 batch-4
encode on a 4-thread desktop CPU (community reports put it at 40-100 ms per
image, i.e. 10-25 img/s).  ``vs_baseline`` is therefore a lower bound on the
true speedup multiple.
"""

from __future__ import annotations

import functools
import json
import os
import statistics
import sys
import time

BASELINE_IMAGES_PER_SEC = 20.0
BATCH = 640  # knee re-swept round 5 under the tanh-gelu + clip-softmax +
             # per-head-requant kernels (scripts/bench_knee.py): the round-4
             # 512+ scheduling cliff is gone and the curve rises to a plateau
             # at 640-1280 (23.1-23.7k in-window); 640 wins the bench protocol
             # (25.7k vs 25.3k at 384) at 2x the round-4 headline batch
ITERS_PER_ROUND = 80   # deep dispatch pipeline: the axon relay charges ~24 ms
                       # per synchronous readback (measured, scripts/roofline_b32.py),
                       # so each round's single sync adds RTT/ITERS of phantom
                       # per-iter cost — 80 iters cuts it to ~0.3 ms (round 4's
                       # 20 iters left 1.2 ms of relay artifact in the headline)
ROUNDS = 5


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    # Persistent XLA cache, repo-local and committed: XLA's TPU int8-GEMM
    # autotuning runs thousands of candidate dispatches and each one pays
    # this environment's ~20-30 ms relay round trip, so a FRESH compile of
    # the W8A8 program costs ~27 min (measured; ~4 distinct GEMM shapes x
    # ~2-7 min each).  The committed cache entry turns that into a ~10 s
    # load; delete .cache/xla_bench to reproduce the cold number.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "xla_bench"))
    from clip_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_tpu.gguf import GGUFReader
    from clip_tpu.models.config import ClipConfig
    from clip_tpu.models.params import load_params
    from clip_tpu.models.vision import encode_image
    from clip_tpu.synth import make_synthetic_gguf

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, "bench_vit-b-32_q4_0_vision.gguf")
    if not os.path.exists(path):
        log("generating synthetic q4_0 ViT-B/32 vision checkpoint ...")
        make_synthetic_gguf(path, "ViT-B/32", ftype="q4_0", towers="vision")

    from clip_tpu.engine import _convert_layers_to_w8

    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    # W8A8: per-channel int8 weights + per-row int8 activations on the int8
    # MXU (the engine's TPU default; +12% vs the bf16 dequant path and ~8%
    # faster than dense bf16 — scripts/bench_w8a8_model.py)
    params = jax.device_put(_convert_layers_to_w8(
        load_params(reader, cfg, keep_quantized=True, dtype=jnp.bfloat16)
    )["vision"])

    def model(params, pixels):
        return encode_image(
            params,
            cfg.vision,
            pixels,
            use_gelu=cfg.use_gelu,
            normalize=True,
            compute_dtype=jnp.bfloat16,
            # scan (not unroll): with W8A8 scan is FASTER (31.1 vs 32.6 ms at
            # B=448) *and* avoids round-2's 556 s unroll compile.
            # lnq_fuse engages the round-4 per-layer hot path: TWO Pallas
            # kernels — the whole-attention-block kernel (LN+quant+int8 qkv
            # GEMM+attention+requant+int8 o GEMM) and the whole-MLP kernel
            # (LN+quant+int8 up GEMM+gelu+requant+int8 down GEMM) — plus the
            # residual adds (scripts/bench_w8a8_model.py round-4 A/Bs)
            lnq_fuse=jax.default_backend() == "tpu",
        )

    # pixels staged in bf16 on the host: the model's first op is the same
    # cast anyway (bit-identical), and the transfer halves
    host_px = (
        np.random.default_rng(0)
        .normal(size=(BATCH, 224, 224, 3))
        .astype(np.float32)
        .astype(jnp.bfloat16)
    )

    log("compiling ...")
    t0 = time.perf_counter()
    if jax.default_backend() == "tpu":
        # AOT with AUTO layout on the pixel arg, then stage the batch in the
        # probed tiled format: drops the program-opening relayout copy of
        # the NHWC input (26.12 vs 26.59-26.74 ms in-window, bit-identical —
        # scripts/bench_pixel_layout.py; the engine does the same via
        # _LayoutAwareJit)
        from clip_tpu.engine import aot_layout_staged

        fn, (pixels,) = aot_layout_staged(model, params, host_px)
    else:
        fn = jax.jit(model)
        pixels = jax.device_put(host_px)

    def round_time() -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS_PER_ROUND):
            out = fn(params, pixels)
        float(jnp.sum(out))  # host readback = hard sync
        return (time.perf_counter() - t0) / ITERS_PER_ROUND

    float(jnp.sum(fn(params, pixels)))
    log(f"compile+first-run: {time.perf_counter() - t0:.1f}s")

    for _ in range(2):
        round_time()  # warmup
    times = [round_time() for _ in range(ROUNDS)]
    dt = statistics.median(times)
    ips = BATCH / dt
    log(f"rounds (ms/iter): {[f'{t*1e3:.1f}' for t in times]}")
    log(f"median: {dt*1e3:.2f} ms / batch of {BATCH} -> {ips:.0f} images/s/chip")

    print(
        json.dumps(
            {
                "metric": "q4_0 ViT-B/32 vision encode throughput",
                "value": round(ips, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
