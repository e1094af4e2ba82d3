"""Patch-embed strategy race: reshape+multi-axis-dot vs native NHWC conv.

hlo_cycles on the round-3 headline program attributes ~2.9 ms (34% of the
top-level, non-scan estimate) to layout copies around the patch embed's
reshape: XLA relayouts the [448,7,32,7,32,3] view before the dot_general
and the [448,7,7,768] result after it.  A stride=patch conv in NHWC is the
layout the TPU conv emitter prefers — no relayout should be needed.

Paths (ViT-B/32 geometry, bf16):
  reshape_dot   production (models/vision.patch_embed)
  conv_nhwc     lax.conv_general_dilated NHWC, window=stride=patch
  patchify_gemm explicit transpose to [B*gh*gw, p*p*c] then one 2-D GEMM

Run: python scripts/bench_patch_embed.py [batch] [image] [patch] [hidden]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_tpu.models.vision import patch_embed
from clip_tpu.utils import enable_compile_cache

B = int(sys.argv[1]) if len(sys.argv) > 1 else 448
IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 224
P = int(sys.argv[3]) if len(sys.argv) > 3 else 32
H = int(sys.argv[4]) if len(sys.argv) > 4 else 768
ITERS = 30


def main():
    enable_compile_cache()
    print(f"backend={jax.default_backend()} B={B} img={IMG} p={P} h={H}", flush=True)
    rng = np.random.default_rng(0)
    w4 = jax.device_put(jnp.asarray(
        rng.normal(0, 0.02, (H, 3, P, P)), jnp.bfloat16))  # [hidden, c, p, p]
    xs = [jax.device_put(jnp.asarray(
        rng.normal(0, 1, (B, IMG, IMG, 3)), jnp.bfloat16)) for _ in range(3)]
    g = IMG // P

    def reshape_dot(px):
        return patch_embed(px, w4, P)

    # NHWC conv: kernel wants HWIO = [p, p, c, hidden]
    w_hwio = jnp.transpose(w4, (2, 3, 1, 0))

    def conv_nhwc(px):
        y = jax.lax.conv_general_dilated(
            px, w_hwio, window_strides=(P, P), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y.astype(px.dtype).reshape(B, g * g, H)

    # explicit patchify: transpose on device then a single 2-D GEMM
    w2 = jnp.transpose(w4, (1, 2, 3, 0)).reshape(3 * P * P, H)  # [c*p*p, h]

    def patchify_gemm(px):
        x6 = px.reshape(B, g, P, g, P, 3)
        xt = jnp.transpose(x6, (0, 1, 3, 5, 2, 4)).reshape(B * g * g, 3 * P * P)
        y = jnp.matmul(xt, w2, preferred_element_type=jnp.float32)
        return y.astype(px.dtype).reshape(B, g * g, H)

    ref = np.asarray(reshape_dot(xs[0]), np.float32)
    for name, fn in (("reshape_dot", reshape_dot), ("conv_nhwc", conv_nhwc),
                     ("patchify_gemm", patchify_gemm)):
        jfn = jax.jit(lambda x, f=fn: jnp.max(jnp.abs(f(x))))
        full = jax.jit(fn)
        got = np.asarray(full(xs[0]), np.float32)
        rel = np.abs(got - ref).max() / (np.abs(ref).max() or 1.0)
        float(jfn(xs[0]))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            acc = [jfn(xs[i % 3]) for i in range(ITERS)]
            jax.block_until_ready(acc)
            ts.append((time.perf_counter() - t0) / ITERS)
        print(f"{name:14s} {min(ts)*1e3:7.3f} ms   maxrel vs prod {rel:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
