"""In-window A/B: pixels staged in the encode program's preferred layout.

The B=448 ViT-B/32 program opens with ``copy.6 bf16[448,224,224,3]`` — a
~2.3M-cycle relayout of the NHWC input from the default {3,2,1,0} layout
into the patch-embed dot's preferred {0,2,3,1} (compiler estimate; the
single largest copy in the program).  jit specializes on the argument's
committed layout, so device_put-ting the pixels into the layout the AUTO
probe reports should let XLA drop that copy from the step — moving the
rearrangement to transfer time, which serving overlaps via prefetch.

Arms (one window):
  default    pixels committed in default layout (production today)
  tiled      pixels device_put into the AUTO-probed Format
  defaultb   drift check

Run: python scripts/bench_pixel_layout.py [batch] [variant]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout

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
    print(f"backend={jax.default_backend()} B={BATCH} {VARIANT} (pixel layout)",
          flush=True)
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
    tag = VARIANT.replace("/", "-").replace("ViT", "vit").lower()
    path = os.path.join(cache, f"bench_{tag}_q4_0_vision.gguf")
    if not os.path.exists(path):
        make_synthetic_gguf(path, VARIANT, ftype="q4_0", towers="vision")

    reader = GGUFReader(path)
    cfg = ClipConfig.from_gguf(reader)
    pw8 = _convert_layers_to_w8(
        load_params(reader, cfg, keep_quantized=True, dtype=jnp.bfloat16))
    params = jax.device_put(pw8["vision"])

    def fn(params, pixels):
        return encode_image(
            params, cfg.vision, pixels, use_gelu=cfg.use_gelu,
            normalize=True, compute_dtype=jnp.bfloat16, lnq_fuse=True)

    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    host_px = rng.standard_normal((BATCH, size, size, 3)).astype(np.float32)
    host_px = jnp.asarray(host_px, jnp.bfloat16)

    # probe the preferred pixels layout once
    probe = jax.jit(fn, in_shardings=(None, Format(Layout.AUTO)))
    fmt = probe.lower(params, host_px).compile().input_formats[0][1]
    print(f"probed pixels layout: {fmt.layout}", flush=True)

    jfn = jax.jit(fn)

    def run_one(name, px):
        out = jfn(params, px)
        ref = np.asarray(out, np.float32)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = jfn(params, px)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / ITERS)
        dt = min(ts)
        print(f"{name:9s}  {dt * 1e3:7.2f} ms/step  {BATCH / dt:8.0f} img/s",
              flush=True)
        return ref

    px_default = jax.device_put(host_px)
    px_tiled = jax.jit(lambda x: x, out_shardings=fmt)(host_px)

    a = run_one("default", px_default)
    b = run_one("tiled", px_tiled)
    print(f"default-vs-tiled max|d| = {float(np.max(np.abs(a - b))):.3e}",
          flush=True)
    run_one("defaultb", px_default)


if __name__ == "__main__":
    main()
