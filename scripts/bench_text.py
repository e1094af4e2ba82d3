"""Text-tower A/B: W8A8 activation-quantized compute vs the bf16 dequant path.

Round-2 protocol (full 77-token context, B=256, synthetic q4_0 ViT-B/32 text
tower) produced 16.4k texts/s on the bf16 dequant path.  Round 3 re-races it:

  q4_bf16   bf16 dequant GEMMs (round-2 path)
  q4_w8a8   per-channel int8 weights + per-row int8 activations (int8 MXU,
            the round-3 engine default)
  dense     dense bf16 weights

Run: python scripts/bench_text.py [batch]
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
from clip_tpu.models.text import encode_text
from clip_tpu.synth import make_synthetic_gguf
from clip_tpu.utils import enable_compile_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = 20


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} B={BATCH} text tower", flush=True)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, "entry_vit-b-32_q4_0_both.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, "ViT-B/32", ftype="q4_0", towers="both")

    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    pq = load_params(reader, cfg, keep_quantized=True, dtype=jnp.bfloat16)
    pw8 = _convert_layers_to_w8(pq)
    pdense = load_params(reader, cfg, keep_quantized=False, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    s = cfg.text.num_positions  # full 77-token context: worst-case batch rows
    ids = jax.device_put(jnp.asarray(
        rng.integers(1, cfg.text.n_vocab - 1, size=(BATCH, s)), jnp.int32))
    lengths = jax.device_put(jnp.full((BATCH,), s, jnp.int32))

    def run_one(name, params, **kw):
        params = jax.device_put(params["text"])
        fn = jax.jit(functools.partial(
            encode_text, cfg=cfg.text, use_gelu=cfg.use_gelu,
            normalize=True, compute_dtype=jnp.bfloat16, **kw))
        out = fn(params, token_ids=ids, lengths=lengths)
        float(jnp.sum(out))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(params, token_ids=ids, lengths=lengths)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / ITERS)
        dt = min(ts)
        print(f"{name:9s}  {dt * 1e3:7.2f} ms/step  {BATCH / dt:8.0f} texts/s",
              flush=True)
        return dt

    run_one("q4_bf16", pq)
    run_one("q4_w8a8", pw8)
    run_one("w8+lnq", pw8, lnq_fuse=True, mlp_full=False, attn_i8=False,
            attn_block=False)
    run_one("lnq_mlp", pw8, lnq_fuse=True, attn_block=False)  # r4 whole-MLP
    run_one("lnq_ablk", pw8, lnq_fuse=True)    # r4 + whole-attention-block
    run_one("up_gq", pw8, up_gq=True, mlp_full=False)  # round-3 text default
    run_one("upgq_mlp", pw8, up_gq=True)       # r4 codes-in whole-MLP
    run_one("dense", pdense)
    run_one("lnq_ablkb", pw8, lnq_fuse=True)  # drift check


if __name__ == "__main__":
    main()
