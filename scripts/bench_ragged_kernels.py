"""In-window A/B for the ragged-grid producer kernels (round 3).

The fused producer kernels originally padded their row axis to the block
multiple at the XLA level (jnp.pad before the pallas_call, slice after),
which at ViT-B/32 B=448 materialized as 24 pad ops (~6.1 ms of
compiler-estimated time: the gemm_gq operands are s8[22528,768] +
f32[22528,1] re-written every layer).  The ragged-grid version passes the
exact row count and lets Mosaic mask the tail block.  This script times
the full production vision encode both ways in one window:

  ragged    production path (kernels as committed)
  padded    old behavior, reproduced by wrapping the kernels with
            explicit pad-to-block + slice at the XLA level
  raggedb   drift check

Run: python scripts/bench_ragged_kernels.py [batch] [variant]
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
from clip_tpu.ops import actquant_pallas as aq
from clip_tpu.models import transformer as tmod
from clip_tpu.synth import make_synthetic_gguf
from clip_tpu.utils import enable_compile_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 448
VARIANT = sys.argv[2] if len(sys.argv) > 2 else "ViT-B/32"
ITERS = 10


def _padded(fn, n_data_args, block_of):
    """Wrap a ragged kernel with the old pad-to-block + slice behavior."""

    @functools.wraps(fn)
    def wrapped(*args, **kw):
        rows = args[0].shape[0]
        br = block_of(*args)
        mp = -(-rows // br) * br
        padded = [jnp.pad(a, ((0, mp - rows), (0, 0))) if i < n_data_args else a
                  for i, a in enumerate(args)]
        outs = fn(*padded, block_rows=br, **kw)
        return tuple(o[:rows] for o in outs)

    return wrapped


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} B={BATCH} {VARIANT} (ragged A/B)",
          flush=True)
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    tag = VARIANT.replace("/", "-").replace("ViT", "vit").lower()
    path = os.path.join(cache, f"bench_{tag}_q4_0_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, VARIANT, ftype="q4_0", towers="vision")

    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    pw8 = _convert_layers_to_w8(
        load_params(reader, cfg, keep_quantized=True, dtype=jnp.bfloat16))

    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    pixels = jax.device_put(jnp.asarray(
        rng.standard_normal((BATCH, size, size, 3)), jnp.bfloat16))
    params = jax.device_put(pw8["vision"])

    def run_one(name):
        fn = jax.jit(functools.partial(
            encode_image, cfg=cfg.vision, use_gelu=cfg.use_gelu,
            normalize=True, compute_dtype=jnp.bfloat16, lnq_fuse=True))
        out = fn(params, pixels=pixels)
        ref = np.asarray(out)
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
        return dt, ref

    _, ref = run_one("ragged")

    lnq_br = lambda x, *a: aq._block_rows(x.shape[0], x.shape[1], aq._ROW_BUDGET)
    gq_br = lambda c, s, w8, *a: aq._gemm_block_rows(c.shape[0], w8.shape[0],
                                                     c.shape[1])
    tmod.lnq_pallas = _padded(aq.lnq_pallas, 1, lnq_br)
    tmod.gemm_gq_pallas = _padded(aq.gemm_gq_pallas, 2, gq_br)
    try:
        _, old = run_one("padded")
    finally:
        tmod.lnq_pallas = aq.lnq_pallas
        tmod.gemm_gq_pallas = aq.gemm_gq_pallas
    d = float(np.max(np.abs(ref.astype(np.float32) - old.astype(np.float32))))
    print(f"ragged-vs-padded max|d| = {d:.3e}", flush=True)

    run_one("raggedb")


if __name__ == "__main__":
    main()
