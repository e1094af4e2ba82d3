"""Measure the ViT-B/32 scaffold piece-by-piece (round-5 roofline follow-up).

Times, at the bench batch:
  pre    = patch_embed + CLS concat + pos add + pre-LN     (jitted alone)
  stack  = run_blocks on a ready [B,S,H] activation        (jitted alone)
  post   = CLS pool + post-LN + proj + l2norm              (jitted alone)
  full   = encode_image                                    (bench protocol)

and prints full - (pre + stack + post) as the residual dispatch/fusion-loss
term, plus stack - 12x slope (scan vs isolated-chain delta).

Run: python scripts/scaffold_pieces.py [batch]
"""

from __future__ import annotations

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
from clip_tpu.models.vision import encode_image, patch_embed
from clip_tpu.models.transformer import run_blocks
from clip_tpu.ops.nn import l2_normalize, layernorm
from clip_tpu.ops.linear import qmatmul
from clip_tpu.ops.qtensor import take_rows
from clip_tpu.utils import enable_compile_cache
from clip_tpu.synth import make_synthetic_gguf

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 384
ITERS = 16
EPS = 1e-5


def timeit(fn, *args, name=""):
    # float(jnp.sum(...)) forces a device->host readback: block_until_ready
    # alone does not round-trip through the axon relay (measures ~0).
    float(jnp.sum(fn(*args)))
    best = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        float(jnp.sum(out))
        best.append((time.perf_counter() - t0) / ITERS)
    t = min(best)
    print(f"{name:10s} {t * 1e3:8.3f} ms", flush=True)
    return t


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} B={BATCH}", flush=True)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    path = os.path.join(cache, "bench_vit-b-32_q4_0_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, "ViT-B/32", ftype="q4_0", towers="vision")
    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    pw8 = _convert_layers_to_w8(
        load_params(reader, cfg, keep_quantized=True, dtype=jnp.bfloat16))
    params = jax.device_put(pw8["vision"])
    vcfg = cfg.vision

    rng = np.random.default_rng(0)
    size = vcfg.image_size
    S, H = 50, vcfg.hidden_size
    pixels = jax.device_put(jnp.asarray(
        rng.standard_normal((BATCH, size, size, 3)), jnp.bfloat16))
    x0 = jax.device_put(jnp.asarray(
        rng.normal(0, 1, (BATCH, S, H)), jnp.bfloat16))

    cdt = jnp.bfloat16

    @jax.jit
    def pre(p, px):
        w = p["patch_embd"].astype(cdt)
        x = patch_embed(px.astype(cdt), w, vcfg.patch_size)
        cls = jnp.broadcast_to(
            p["class_embd"].astype(cdt)[None, None, :], (BATCH, 1, H))
        x = jnp.concatenate([cls, x], axis=1)
        pos = take_rows(p["pos_embd"], jnp.arange(vcfg.num_positions), dtype=cdt)
        x = x + pos[None, :, :]
        return layernorm(x, p["pre_ln_w"], p["pre_ln_b"], vcfg.eps)

    @jax.jit
    def pe_only(p, px):
        return patch_embed(px.astype(cdt), p["patch_embd"].astype(cdt),
                           vcfg.patch_size)

    @jax.jit
    def stack(p, x):
        return run_blocks(
            x, p["layers"], n_head=vcfg.n_head, eps=vcfg.eps, use_gelu=True,
            causal=False, compute_dtype=cdt, attn_impl="auto",
            lnq_fuse=True, mlp_full=True, attn_block=True)

    @jax.jit
    def post(p, x):
        pooled = layernorm(x[:, 0, :], p["post_ln_w"], p["post_ln_b"], vcfg.eps)
        return l2_normalize(qmatmul(pooled, p["proj"], compute_dtype=cdt))

    fn = jax.jit(lambda p, px: encode_image(
        p, vcfg, px, use_gelu=cfg.use_gelu, normalize=True,
        compute_dtype=cdt, lnq_fuse=True))

    t_pe = timeit(pe_only, params, pixels, name="patch_embed")
    t_pre = timeit(pre, params, pixels, name="pre")
    t_stack = timeit(stack, params, x0, name="stack")
    t_post = timeit(post, params, x0, name="post")
    t_full = timeit(fn, params, pixels, name="full")

    print(f"\npre+stack+post = {(t_pre + t_stack + t_post) * 1e3:.3f} ms; "
          f"residual (dispatch/stitch) = "
          f"{(t_full - t_pre - t_stack - t_post) * 1e3:.3f} ms")
    print(f"pre minus patch_embed (cls/pos/preLN) = "
          f"{(t_pre - t_pe) * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
