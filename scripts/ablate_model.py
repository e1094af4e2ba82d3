"""In-model ablation: where does the ViT-B/32 B=256 step time go?

Monkeypatches pieces of clip_tpu.models.transformer out of the graph and
re-times the full encode with bench.py's protocol.  Differences vs 'full'
attribute time to each component.
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
from clip_tpu.models import transformer
from clip_tpu.models.config import ClipConfig
from clip_tpu.models.params import load_params
from clip_tpu.models.vision import encode_image
from clip_tpu.ops.linear import linear
from clip_tpu.ops.nn import gelu_quick, gelu_tanh, layernorm
from clip_tpu.synth import make_synthetic_gguf

BATCH = 256
ITERS = 10

orig_attention = transformer.attention
orig_block = transformer.block


def attn_no_core(x, lp, *, n_head, causal=False, compute_dtype=jnp.float32,
                 attn_impl="auto", qmm_backend=None, tp_axis=None):
    qkv = linear(x, lp["qkv_w"], lp["qkv_b"], compute_dtype=compute_dtype)
    q = jnp.split(qkv, 3, axis=-1)[0]
    return linear(q, lp["o_w"], lp["o_b"], compute_dtype=compute_dtype)


def attn_skip(x, lp, **kw):
    return x


def block_no_mlp(x, lp, *, n_head, eps, use_gelu, causal=False,
                 compute_dtype=jnp.float32, attn_impl="auto", qmm_backend=None, tp_axis=None):
    h = layernorm(x, lp["ln1_w"], lp["ln1_b"], eps)
    return x + transformer.attention(
        h, lp, n_head=n_head, causal=causal,
        compute_dtype=compute_dtype, attn_impl=attn_impl)


def block_ln_only(x, lp, *, n_head, eps, use_gelu, causal=False,
                  compute_dtype=jnp.float32, attn_impl="auto", qmm_backend=None, tp_axis=None):
    h = layernorm(x, lp["ln1_w"], lp["ln1_b"], eps)
    h = layernorm(h, lp["ln2_w"], lp["ln2_b"], eps)
    return x + h


def timeit(fn, params, pixels):
    out = fn(params, pixels=pixels)
    float(jnp.sum(out))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(params, pixels=pixels)
        float(jnp.sum(out))
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts) * 1e3


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    path = os.path.join(cache, "bench_vit-b-32_q4_0_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, "ViT-B/32", ftype="q4_0", towers="vision")
    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    pixels = jax.device_put(
        np.random.default_rng(0).normal(size=(BATCH, 224, 224, 3)).astype(np.float32))

    results = {}
    for quant in (True, False):
        params = jax.device_put(load_params(
            reader, cfg, keep_quantized=quant, dtype=jnp.bfloat16)["vision"])
        tag = "q4_0" if quant else "bf16"
        for name, attn, blk, impl in [
            ("full", orig_attention, orig_block, "auto"),
            ("full_xla_attn", orig_attention, orig_block, "xla"),
            ("attn_no_core", attn_no_core, orig_block, "auto"),
            ("attn_skip", attn_skip, orig_block, "auto"),
            ("no_mlp", orig_attention, block_no_mlp, "auto"),
            ("ln_only", orig_attention, block_ln_only, "auto"),
        ]:
            transformer.attention = attn
            transformer.block = blk
            # run_blocks resolves `block`/`attention` via module globals at
            # trace time, so the monkeypatch above is all that's needed
            fn = jax.jit(functools.partial(
                encode_image, cfg=cfg.vision, use_gelu=cfg.use_gelu,
                normalize=True, compute_dtype=jnp.bfloat16, attn_impl=impl))
            ms = timeit(fn, params, pixels)
            results[f"{tag}/{name}"] = ms
            print(f"{tag}/{name:14s} {ms:7.2f} ms/step", flush=True)
        if quant:
            f = results
            print(f"  -> attn core : {f[f'{tag}/full'] - f[f'{tag}/attn_no_core']:6.2f} ms")
            print(f"  -> qkv+o     : {f[f'{tag}/attn_no_core'] - f[f'{tag}/attn_skip']:6.2f} ms")
            print(f"  -> mlp       : {f[f'{tag}/attn_skip'] - f[f'{tag}/ln_only']:6.2f} ms  (approx)")
    transformer.attention = orig_attention
    transformer.block = orig_block


if __name__ == "__main__":
    main()
