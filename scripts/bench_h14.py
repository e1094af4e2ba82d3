"""ViT-H/14 (d_head=80) dedicated perf round.

H/14 is the one BASELINE.json config every round-2 win skipped: the flat
kernel, 2-D qkv GEMM and pad-once are all gated on d_head % 64 == 0 and its
heads are 80 wide.  This script races, in-run:

  base        current production path (padded 3-D kernel, per-layer S 257->264
              in-kernel pad)
  pad272      pad-once at embedding to S=272 (the padded kernel's bf16
              sublane tile is 16, so 272 — not 264 — is what makes its
              per-layer jnp.pad a no-op) and FORCE the padded 3-D kernel
              (avoids the 80-wide lane slices the flat path mishandles) —
              never measured in round 2
  flat264     pad-once + let the flat kernel/2-D qkv engage (round-2's -10%,
              re-raced with the current kernels)
  xla         XLA einsum attention reference
  noattn      attention core skipped (attributes the attention-stage time)

Each attention variant is raced twice: with the bf16 dequant GEMMs (round-2
path) and with W8A8 (per-channel int8 weights + per-row int8 activations on
the int8 MXU, the round-3 engine default) — W8A8 is a pure GEMM change with
no d_head gate, so it is H/14's first ungated lever since round 1.

Run: python scripts/bench_h14.py [batch ...]
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
from clip_tpu.ops import attention_pallas
from clip_tpu.synth import make_synthetic_gguf
from clip_tpu.utils import enable_compile_cache

BATCHES = [int(a) for a in sys.argv[1:]] or [32]
ITERS = 6
VARIANT = "ViT-H/14"

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
_orig_flat_block_b = attention_pallas._flat_block_b


def load_tower():
    os.makedirs(_CACHE, exist_ok=True)
    path = os.path.join(_CACHE, "bench_vit-h-14_q5_1_vision.gguf")
    if not os.path.exists(path):
        # BASELINE.json config 5 is q5_1 two-tower; vision-only is the hot side
        make_synthetic_gguf(path, VARIANT, ftype="q5_1", towers="vision")
    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    from clip_tpu.engine import _convert_layers_to_w8

    base = load_params(reader, cfg, keep_quantized=True, dtype=jnp.bfloat16)
    params = jax.device_put(base["vision"])
    params_w8 = jax.device_put(_convert_layers_to_w8(base)["vision"])
    return cfg, params, params_w8


def make_fn(cfg, mode: str):
    base = functools.partial(
        encode_image, cfg=cfg.vision, use_gelu=cfg.use_gelu, normalize=True,
        compute_dtype=jnp.bfloat16,
    )
    if mode in ("base", "noattn"):
        return jax.jit(lambda p, px: base(p, pixels=px))
    if mode == "xla":
        return jax.jit(lambda p, px: base(p, pixels=px, attn_impl="xla"))

    # pad-once variants: replicate encode_image's pad-once block without its
    # d_head%64 gate by padding the pixels' sequence inside a wrapper is not
    # possible (the pad happens post-embedding), so drive run_blocks directly.
    from clip_tpu.ops.nn import l2_normalize, layernorm
    from clip_tpu.ops.linear import qmatmul
    from clip_tpu.models.vision import patch_embed
    from clip_tpu.ops.qtensor import take_rows

    vcfg = cfg.vision

    # the padded 3-D kernel's bf16 sublane tile is 16, so the pad-once that
    # fully kills its per-layer jnp.pad must go to a 16-multiple (257->272);
    # the flat kernel only needs 8 (257->264)
    mult = 16 if mode == "pad272" else 8

    def fn(params, pixels):
        b = pixels.shape[0]
        x = patch_embed(pixels.astype(jnp.bfloat16),
                        params["patch_embd"].astype(jnp.bfloat16), vcfg.patch_size)
        cls = params["class_embd"].astype(jnp.bfloat16)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None, :], (b, 1, vcfg.hidden_size)), x], 1)
        pos = take_rows(params["pos_embd"], jnp.arange(vcfg.num_positions),
                        dtype=jnp.bfloat16)
        x = x + pos[None, :, :]
        x = layernorm(x, params["pre_ln_w"], params["pre_ln_b"], vcfg.eps)
        s_real = x.shape[1]
        sp = -(-s_real // mult) * mult
        x = jnp.pad(x, ((0, 0), (0, sp - s_real), (0, 0)))
        x = transformer.run_blocks(
            x, params["layers"], n_head=vcfg.n_head, eps=vcfg.eps,
            use_gelu=cfg.use_gelu, causal=False, compute_dtype=jnp.bfloat16,
            valid_len=s_real)
        pooled = layernorm(x[:, 0, :], params["post_ln_w"], params["post_ln_b"],
                           vcfg.eps)
        return l2_normalize(qmatmul(pooled, params["proj"],
                                    compute_dtype=jnp.bfloat16))

    return jax.jit(fn)


def time_mode(name, fn, params, pixels, patch=None):
    # mha_pallas_qkv is itself jitted: flush its trace cache so the
    # _flat_block_b patch actually changes the compiled path for equal shapes
    attention_pallas.mha_pallas_qkv.clear_cache()
    orig_attn = transformer.attention
    if patch == "noflat":
        attention_pallas._flat_block_b = lambda b, s, h3=None: None
    elif patch == "noattn":
        def attn_skip(x, lp, **kw):
            from clip_tpu.ops.linear import linear
            from clip_tpu.ops.nn import layernorm
            x_res = x
            ln = kw.get("ln")
            if ln is not None:  # block delegates pre-LN to attention now
                x = layernorm(x, ln[0], ln[1], ln[2])
            qkv = linear(x, lp["qkv_w"], lp["qkv_b"], compute_dtype=x.dtype)
            q = jnp.split(qkv, 3, axis=-1)[0]
            out = linear(q, lp["o_w"], lp["o_b"], compute_dtype=x.dtype)
            return x_res + out if kw.get("add_residual") else out
        transformer.attention = attn_skip
    try:
        out = fn(params, pixels)
        float(jnp.sum(out))  # compile + sync
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(params, pixels)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / ITERS)
        dt = min(ts)
        b = pixels.shape[0]
        print(f"{name:10s} B={b:3d}  {dt * 1e3:7.2f} ms/step  {b / dt:7.1f} img/s",
              flush=True)
        return dt
    except Exception as e:
        print(f"{name:10s}  FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    finally:
        attention_pallas._flat_block_b = _orig_flat_block_b
        transformer.attention = orig_attn


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} variant={VARIANT}")
    cfg, params, params_w8 = load_tower()
    rng = np.random.default_rng(0)
    for b in BATCHES:
        pixels = jax.device_put(jnp.asarray(
            rng.standard_normal((b, cfg.vision.image_size, cfg.vision.image_size, 3)),
            jnp.bfloat16))
        base_fn = make_fn(cfg, "base")
        t_base = time_mode("base", base_fn, params, pixels)
        time_mode("w8a8", base_fn, params_w8, pixels)
        time_mode("pad272", make_fn(cfg, "pad272"), params, pixels, patch="noflat")
        time_mode("w8+p272", make_fn(cfg, "pad272"), params_w8, pixels, patch="noflat")
        time_mode("flat264", make_fn(cfg, "flat264"), params, pixels)
        time_mode("w8+f264", make_fn(cfg, "flat264"), params_w8, pixels)
        time_mode("xla", make_fn(cfg, "xla"), params, pixels)
        time_mode("noattn", make_fn(cfg, "noattn"), params, pixels, patch="noattn")
        if t_base:
            time_mode("base2", base_fn, params, pixels)  # drift check


if __name__ == "__main__":
    main()
